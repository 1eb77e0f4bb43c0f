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
    // handle-exact tracking ([[LocalCheckpoints]]): the RDD each eager
    // localCheckpoint persisted comes straight off the returned frame's
    // plan, never from the SparkContext-global registry — the registry
    // diff this replaced raced concurrent queries' persists (Verify runs
    // on a thread pool) and could unpersist a sibling's only copy
    import LocalCheckpoints.{tracked, free}
    // null endpoints are excluded (r14): the visited anti-join can never
    // match null = null, so an unfiltered null dst would re-enter the
    // frontier EVERY round — duplicate null-node rows at ascending hops,
    // violating the exactly-once-at-minimal-hop invariant
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    var (visited, visitedRdds) = tracked(
      seeds.select(col("node")).distinct().filter(col("node").isNotNull)
        .withColumn("hop", lit(0)))
    var frontier = visited
    var frontierRdds = Seq.empty[org.apache.spark.rdd.RDD[_]] // round 0 shares the visited blocks
    for (h <- 1 to maxHops) {
      val (next, nextRdds) = tracked(
        frontier
          .join(e, frontier("node") === e("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited.select(col("node")), Seq("node"), "left_anti")
          .withColumn("hop", lit(h)))
      free(frontierRdds) // pre-round frontier: consumed by the join above
      val (newVisited, newVisitedRdds) = tracked(visited.union(next))
      free(visitedRdds) // pre-round visited: folded into the union
      visited = newVisited
      visitedRdds = newVisitedRdds
      frontier = next
      frontierRdds = nextRdds
    }
    // the last frontier was folded into the final visited checkpoint;
    // only the result's own blocks stay pinned
    free(frontierRdds)
    visited.select(col("node"), col("hop").cast("int").as("hop"))
  }
}
