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
    * unreached within maxHops are absent from the result. */
  def hops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    var visited = seeds.select(col("node")).distinct()
      .withColumn("hop", lit(0)).localCheckpoint(true)
    var frontier = visited
    for (h <- 1 to maxHops) {
      val next = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("hop", lit(h))
        .localCheckpoint(true)
      visited = visited.union(next).localCheckpoint(true)
      frontier = next
    }
    visited.select(col("node"), col("hop").cast("int").as("hop"))
  }
}
