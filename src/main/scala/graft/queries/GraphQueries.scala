package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.PageRank

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
    "graph_pagerank" -> (graphPagerank _)
  )

  val oracles: Map[String, String] = Map(
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
         |FROM r10 ORDER BY node""".stripMargin
  )
}
