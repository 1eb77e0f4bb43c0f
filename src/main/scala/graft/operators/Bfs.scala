package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth multi-source BFS: hop distance from the nearest seed,
  * by synchronous frontier expansion — the fourth graph primitive next
  * to PageRank, triangle counting, and connected components.
  *
  * Each round is one equi-join of the current frontier against the edge
  * list (shuffle on the edge key) plus one anti-join against the visited
  * set, so a round's cost is proportional to the frontier's out-edges,
  * never to the whole graph; `localCheckpoint` truncates lineage per
  * round exactly like the connected-components label loop (without it,
  * round k's plan would re-expand every previous round). Depth is a
  * bounded constant, which is what makes BFS shippable at 100 TB:
  * curation wants "within k hops of a canonical doc", not full
  * all-pairs shortest paths.
  *
  * A node reached in round h joins `visited` at hop h and the anti-join
  * removes it from every later frontier — so each node lands exactly
  * once, at its minimal hop; ties across multiple seeds/parents are
  * irrelevant because only the hop is kept.
  */
object Bfs {

  /** Hop distance (0..maxHops) from the nearest seed over a DIRECTED
    * edge list (symmetrize upstream for undirected semantics). Nodes
    * unreached within maxHops are absent from the result.
    *
    * Checkpoint hygiene: each round's eager `localCheckpoint`
    * SUPERSEDES the previous round's visited/frontier blocks — they
    * are unpersisted as soon as the new round is materialized, so the
    * loop holds at most two rounds of state instead of accumulating
    * every round until job end. Note `localCheckpoint` stores
    * UNREPLICATED executor blocks: cheap, but an executor loss
    * mid-loop fails the job — production runs on unreliable clusters
    * should swap in reliable `checkpoint()` (DFS-backed) at the cost
    * of a write per round. */
  def hops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // localCheckpoint exposes no handle to its persisted RDD, so learn
    // each checkpoint's block ids by diffing the persistent-RDD registry
    // around the (eager) call — single-threaded builder, so the diff is
    // exactly this checkpoint's blocks
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    val e = edges.select(col("src"), col("dst"))
    var (visited, visitedIds) = checkpointTracked(
      seeds.select(col("node")).distinct().withColumn("hop", lit(0)))
    var frontier = visited
    var frontierIds = Set.empty[Int] // round 0 shares the visited blocks
    for (h <- 1 to maxHops) {
      val (next, nextIds) = checkpointTracked(
        frontier
          .join(e, frontier("node") === e("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited.select(col("node")), Seq("node"), "left_anti")
          .withColumn("hop", lit(h)))
      free(frontierIds) // pre-round frontier: consumed by the join above
      val (newVisited, newVisitedIds) = checkpointTracked(visited.union(next))
      free(visitedIds) // pre-round visited: folded into the union
      visited = newVisited
      visitedIds = newVisitedIds
      frontier = next
      frontierIds = nextIds
    }
    // the last frontier was folded into the final visited checkpoint;
    // only the result's own blocks stay pinned
    free(frontierIds)
    visited.select(col("node"), col("hop").cast("int").as("hop"))
  }
}
