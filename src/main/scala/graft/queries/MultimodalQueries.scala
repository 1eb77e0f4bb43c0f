package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal extension queries. The declarative payload paths (byte
  * length, md5, frame-task explode) carry DuckDB oracles; the stubbed
  * decoder path (`extractFeatures`, mapPartitions) is engine-side only →
  * rows-only check.
  */
object MultimodalQueries {

  private def media(spark: SparkSession, dir: String): DataFrame =
    Multimodal.fromDocuments(Tables.documents(spark, dir))

  def payloadStats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.payloadStats(media(spark, dir)).orderBy(col("media_id"))

  def frameTasks(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(media(spark, dir), everyMs = 250)
      .orderBy(col("media_id"), col("frame_idx"))

  /** Driver-facing projection: the embedding array is reduced to scalar
    * digests (dim + rounded L2 norm) because the rows-only gate sorts
    * output columns in pandas, where raw arrays aren't hashable. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.extractFeatures(media(spark, dir)).toDF()
    feats.select(col("media_id"), col("kind"), col("n_bytes"),
      col("payload_md5"),
      size(col("embedding")).as("emb_dim"),
      round(sqrt(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("emb_l2"))
      .orderBy(col("media_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_payload_stats" -> (payloadStats _),
    "mm_frame_tasks" -> (frameTasks _),
    "mm_decode_features" -> (decodeFeatures _)
  )

  val oracles: Map[String, String] = Map(
    "mm_payload_stats" ->
      """SELECT doc_id AS media_id,
        |       ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
        |       octet_length(encode(text)) AS n_bytes,
        |       md5(text) AS payload_md5,
        |       (doc_id % 640 + 64)::INT AS width,
        |       ((doc_id % 10) * 1000 + 500)::INT AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,
    "mm_frame_tasks" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, ((doc_id % 10) * 1000 + 500)::INT AS duration_ms
        |  FROM documents WHERE ['image','audio','video'][(doc_id % 3 + 1)::INT] = 'video')
        |SELECT media_id, CAST(f.i / 250 AS INT) AS frame_idx, f.i::INT AS frame_ts_ms
        |FROM v, LATERAL (SELECT unnest(range(0, duration_ms + 1, 250)) AS i) f
        |ORDER BY media_id, frame_idx""".stripMargin
  )
}
