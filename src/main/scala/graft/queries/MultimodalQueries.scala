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

  /** Driver-facing projection: every stub-embedding component surfaces
    * as a DOUBLE column (float widened — exact), plus dim and rounded
    * L2. Fully oracle-backed since the stub's integer-sum accumulator
    * is engine-neutral: DuckDB rebuilds each component from per-doc
    * byte sums (text is ASCII, so `ord` = byte) and the hash gate pins
    * the whole mapPartitions decode path — schema, batching, digest
    * reuse, and the fake codec's arithmetic. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    // r20 (guide §2.5 "repartition after unsplittable input"): the decode
    // chain — mapPartitions feature extraction plus the HOF L2 projection —
    // fuses onto the documents scan, and a one-row-group testdata file runs
    // that whole chain as ONE task TWICE (the final orderBy's range-sampling
    // pass re-executes the plan). Spread the scan BEFORE synthesizing the
    // payload column so the exchange carries the narrow (doc_id, text) rows;
    // at many-row-group production layouts spreadForCompute is the identity,
    // so extractFeatures stays scan-side there (the operator's no-payload-
    // shuffle contract). The other mm_* queries are declarative and cheap —
    // measured fine unspread.
    val spread = Multimodal.fromDocuments(
      Tables.spreadForCompute(Tables.documents(spark, dir), col("doc_id")))
    val feats = Multimodal.extractFeatures(spread).toDF()
    val components = (0 until 8).map(d =>
      element_at(col("embedding"), d + 1).cast("double").as(s"e$d"))
    feats.select(Seq(col("media_id"), col("kind"), col("n_bytes"),
      col("payload_md5"),
      size(col("embedding")).as("emb_dim")) ++ components :+
      round(sqrt(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("emb_l2"): _*)
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
        |ORDER BY media_id, frame_idx""".stripMargin,
    // the stub codec's per-dim accumulators are exact integer byte sums
    // (text is ASCII: ord = byte value); one float division at the end
    // makes each component reproducible bit-for-bit outside the JVM
    "mm_decode_features" ->
      ("""WITH b AS (
        |  SELECT doc_id, CAST(i % 8 AS INT) AS d, ord(substr(text, CAST(i AS INT) + 1, 1)) AS v
        |  FROM (SELECT doc_id, text, unnest(range(length(text))) AS i FROM documents)),
        |s AS (
        |  SELECT doc_id, d, CAST(SUM(v) AS BIGINT) AS sv FROM b GROUP BY doc_id, d),
        |dims AS (
        |  SELECT doc_id, CAST(r.i AS INT) AS d FROM documents, range(8) r(i)),
        |emb AS (
        |  SELECT dims.doc_id,
        |         list(CAST(CAST(COALESCE(s.sv, 0) AS DOUBLE) / 255.0 AS REAL)
        |              ORDER BY dims.d) AS e
        |  FROM dims LEFT JOIN s ON s.doc_id = dims.doc_id AND s.d = dims.d
        |  GROUP BY dims.doc_id)
        |SELECT doc.doc_id AS media_id,
        |       ['image','audio','video'][(doc.doc_id % 3 + 1)::INT] AS kind,
        |       CAST(length(doc.text) AS BIGINT) AS n_bytes,
        |       md5(doc.text) AS payload_md5,
        |       CAST(8 AS INT) AS emb_dim,
        |""".stripMargin +
        (0 until 8).map(d => s"       CAST(e[${d + 1}] AS DOUBLE) AS e$d,")
          .mkString("\n") + "\n" +
        """       round(sqrt(list_sum(list_transform(e,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS emb_l2
        |FROM documents doc JOIN emb ON emb.doc_id = doc.doc_id
        |ORDER BY media_id""".stripMargin)
  )
}
