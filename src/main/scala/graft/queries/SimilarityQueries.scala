package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Similarity-search extension queries over `embeddings` (64-dim float
  * vectors). Query set = every 50th vector. The brute-force queries have
  * exact DuckDB oracles (list_cosine_similarity on DOUBLE[] is
  * bit-identical to our sequential double fold; both sides round to 9 dp
  * before ranking). The LSH variant is approximate → rows-only check.
  */
object SimilarityQueries {

  private def queriesSubset(df: DataFrame): DataFrame =
    df.filter(col("vec_id") % 50 === 0)

  def simTopKBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.bruteForceTopK(emb, queriesSubset(emb), "vec_id", "embedding", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  def simNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding",
      threshold = 0.4)
      .orderBy(col("id_a"), col("id_b"))

  /** Same semantics as simTopKBrute through the map-side top-k aggregate
    * (shares its oracle — that is the aggregate's correctness proof). */
  def simTopKAgg(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.bruteForceTopKAgg(emb, queriesSubset(emb), "vec_id", "embedding", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  def simTopKLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.lshTopK(emb, queriesSubset(emb), "vec_id", "embedding", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-flat scale path (rows-only: k-means cells are engine-internal). */
  def simTopKIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.operators.Ivf.topK(emb, queriesSubset(emb), "vec_id", "embedding",
      k = 10, nCells = 16, nProbe = 4)
      .orderBy(col("query_id"), col("rank"))
  }

  /** kNN self-join over LSH buckets (rows-only: approximate). */
  def simKnnJoin(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnJoinLsh(Tables.embeddings(spark, dir), "vec_id", "embedding", k = 5)
      .orderBy(col("query_id"), col("rank"))

  /** LSH-blocked near-dup pairs — the scale path whose baseline is the
    * brute-force `sim_neardup_embeddings` (rows-only: approximate;
    * recall spec-asserted against brute force). */
  def simNearDupLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairsLsh(Tables.embeddings(spark, dir), "vec_id", "embedding",
      threshold = 0.4)
      .orderBy(col("id_a"), col("id_b"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_knn_join_lsh" -> (simKnnJoin _),
    "sim_neardup_lsh" -> (simNearDupLsh _),
    "sim_topk_brute" -> (simTopKBrute _),
    "sim_topk_agg" -> (simTopKAgg _),
    "sim_neardup_embeddings" -> (simNearDup _),
    "sim_topk_lsh" -> (simTopKLsh _),
    "sim_topk_ivf" -> (simTopKIvf _)
  )

  private val topkOracle =
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nvec
        |      FROM embeddings),
        |scored AS (
        |  SELECT q.query_id, c.neighbor_id,
        |         round(list_cosine_similarity(q.qvec, c.nvec), 9) AS sim
        |  FROM q CROSS JOIN c WHERE c.neighbor_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, sim FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_topk_brute" -> topkOracle,
    "sim_topk_agg" -> topkOracle,
    "sim_neardup_embeddings" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(a.vec, b.vec), 9) AS sim
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.vec, b.vec), 9) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin
  )
}
