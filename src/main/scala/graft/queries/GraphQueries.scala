package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bfs, PageRank, Triangles}

/** Graph analytics over the near-dup pair graph. The reference
  * pipeline (dotsering/kafka-connect-minio-pipeline) has no graph
  * operator; like the connected-components clusterer this extends the
  * curation surface — PageRank centrality over duplication edges is a
  * standard "how templated is this document" prior (boilerplate hubs
  * collect rank from their whole neighborhood).
  */
object GraphQueries {

  /** 10 damped integer-PageRank rounds over the symmetrized near-dup
    * graph ([[PageRank.ranks]]): per-node duplication centrality in
    * micro-units of a 10^12 total mass. Exactly reproduced by the
    * oracle's unrolled iteration chain — integer division and sums
    * only, so no aggregation-order drift at any scale. */
  def graphPagerank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = DedupQueries.neardupPairs(spark, dir)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    PageRank.ranks(edges, iterations = 10)
      .select(col("node"), col("deg"), col("rank_micro"))
      .orderBy(col("node"))
  }

  /** Per-node triangle counts + local clustering coefficient over the
    * same near-dup graph ([[Triangles.perNode]]): how clique-like each
    * document's duplication neighborhood is (template family vs
    * drifting-revision chain). Shares the memoized pair signal with
    * pagerank and the cluster queries. */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame =
    Triangles.perNode(DedupQueries.neardupPairs(spark, dir))
      .orderBy(col("node"))

  /** Bounded multi-source BFS over the same near-dup graph
    * ([[Bfs.hops]]): hop distance (≤ 3) from the nearest "locally
    * canonical" document — a node smaller than every neighbor, the
    * deterministic seed set a revision chain's keeper election uses.
    * The curation meaning: how many near-dup steps separate each doc
    * from a keeper. Unreached nodes are absent. The oracle replays the
    * exact frontier expansion as a depth-capped recursive CTE with a
    * MIN(hop) rollup. */
  def graphBfsHops(spark: SparkSession, dir: String): DataFrame = {
    val pairs = DedupQueries.neardupPairs(spark, dir)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    val seeds = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("min_nbr"))
      .filter(col("src") < col("min_nbr"))
      .select(col("src").as("node"))
    Bfs.hops(edges, seeds, maxHops = 3).orderBy(col("node"))
  }

  private val mass = 1000000000000L

  /** One unrolled PageRank round: rank state r{i} from r{i-1} — the
    * same LEFT JOIN + integer-division update the Spark loop runs.
    * MATERIALIZED is load-bearing: each round references its
    * predecessor twice (the state side and the contribution side), so
    * inlined CTEs would re-expand the whole upstream LSH chain 2^iters
    * times — the SQL mirror of the Spark loop's localCheckpoint. */
  private def prIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT s.node, s.deg,
         |         (15 * ($mass // (SELECT n FROM nn))) // 100
         |           + (85 * COALESCE(c.m, 0)) // 100 AS r
         |  FROM r${i - 1} s LEFT JOIN (
         |    SELECT e.dst AS node, SUM(x.r // x.deg) AS m
         |    FROM r${i - 1} x JOIN e2 e ON e.src = x.node
         |    GROUP BY e.dst) c USING (node))""".stripMargin
    }.mkString(",\n")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank _),
    "graph_triangles" -> (graphTriangles _),
    "graph_bfs_hops" -> (graphBfsHops _)
  )

  val oracles: Map[String, String] = Map(
    // WITH RECURSIVE heads the whole CTE list (the non-recursive graph
    // CTEs ride along); UNION (not ALL) dedups (node, hop) pairs so the
    // depth-capped recursion stays finite, and MIN(hop) per node is the
    // BFS distance
    "graph_bfs_hops" ->
      s"""WITH RECURSIVE ${DedupQueries.neardupGraphCtes},
         |e2 AS MATERIALIZED (SELECT src, dst FROM edges),
         |seeds AS (SELECT src AS node FROM e2 GROUP BY src HAVING src < MIN(dst)),
         |bfs(node, hop) AS (
         |  SELECT node, 0 FROM seeds
         |  UNION
         |  SELECT e.dst, bfs.hop + 1
         |  FROM bfs JOIN e2 e ON e.src = bfs.node WHERE bfs.hop < 3)
         |SELECT node, CAST(MIN(hop) AS INT) AS hop
         |FROM bfs GROUP BY node ORDER BY node""".stripMargin,
    "graph_pagerank" ->
      s"""WITH ${DedupQueries.neardupGraphCtes},
         |e2 AS MATERIALIZED (SELECT src, dst FROM edges),
         |deg AS MATERIALIZED (
         |  SELECT src AS node, COUNT(*) AS deg FROM e2 GROUP BY src),
         |nn AS (SELECT COUNT(*) AS n FROM deg),
         |r0 AS MATERIALIZED (
         |  SELECT node, deg, $mass // (SELECT n FROM nn) AS r FROM deg),
         |${prIterCtes(10)}
         |SELECT node, CAST(deg AS BIGINT) AS deg, CAST(r AS BIGINT) AS rank_micro
         |FROM r10 ORDER BY node""".stripMargin,
    // triangles enumerated once as a<b<c over the distinct (a<b) pair
    // set; per-corner counts then left-join every node
    "graph_triangles" ->
      s"""WITH ${DedupQueries.neardupGraphCtes},
         |p AS MATERIALIZED (SELECT DISTINCT src AS a, dst AS b FROM edges WHERE src < dst),
         |d AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
         |tr AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM p e1 JOIN p e2 ON e2.a = e1.b
         |            JOIN p e3 ON e3.a = e1.a AND e3.b = e2.b),
         |corners AS (
         |  SELECT x AS node FROM tr
         |  UNION ALL SELECT y FROM tr
         |  UNION ALL SELECT z FROM tr),
         |tc AS (SELECT node, COUNT(*) AS t FROM corners GROUP BY node)
         |SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
         |       CAST(COALESCE(tc.t, 0) AS BIGINT) AS n_triangles,
         |       CAST(CASE WHEN d.deg >= 2
         |                 THEN (2 * COALESCE(tc.t, 0) * 1000000)
         |                        // (d.deg * (d.deg - 1))
         |                 ELSE 0 END AS BIGINT) AS lcc_micro
         |FROM d LEFT JOIN tc USING (node) ORDER BY d.node""".stripMargin
  )
}
