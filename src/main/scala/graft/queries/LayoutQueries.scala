package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprBridge

import graft.expressions.NfcNormalize
import graft.operators.{Skyline, ZOrder}

/** Data-layout and multi-criteria curation operators past the reference
  * surface: skyline (Pareto frontier), Z-order clustering math, and
  * Unicode normalization — each with a full DuckDB oracle.
  *
  * The reference pipeline (dotsering/kafka-connect-minio-pipeline) has no
  * counterpart for any of these; they extend the curation surface the way
  * SURVEY.md §2's "beyond-parity" rows do (see `connectors/s3-sink.json`
  * for the reference's whole layout story: flush.size batching only).
  */
object LayoutQueries {

  private def nfc(c: Column): Column = ExprBridge.column(NfcNormalize(ExprBridge.expression(c)))

  /** Global skyline of `part`: minimize retail price, maximize size —
    * "cheapest tradeoff" parts no other part beats on both axes.
    * Distributive two-phase plan: per-partition prune scan-side, merge
    * of the tiny frontiers (see `operators/Skyline.scala`). */
  def skylineFrontier(spark: SparkSession, dir: String): DataFrame =
    Skyline.frontier(
        graft.sources.Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_size"), col("p_retailprice")),
        Seq(col("p_retailprice"), -col("p_size")))
      .orderBy(col("p_partkey"))

  /** Per-brand skyline: one hash shuffle on the (slim, projected) group
    * key, exact single-pass prune per group — parallel across brands. */
  def skylineBrand(spark: SparkSession, dir: String): DataFrame =
    Skyline.frontierPerGroup(
        graft.sources.Tables.part(spark, dir)
          .select(col("p_brand"), col("p_partkey"), col("p_size"), col("p_retailprice")),
        "p_brand",
        Seq(col("p_retailprice"), -col("p_size")))
      .orderBy(col("p_brand"), col("p_partkey"))

  /** Z-order tile map of `events` on (user_id, time): both dimensions
    * quantized to 8 bits by global min/max in exact integer arithmetic
    * (`div`, no float), Morton-interleaved inside whole-stage codegen,
    * rolled up per 256-z-value tile. The per-tile min/max columns ARE
    * the data-skipping story: every tile spans at most a 16-wide band of
    * EACH dimension, so files written in z-order carry narrow stats on
    * both columns (single-column sort layouts leave the second dimension
    * unpruned). Membership is pinned by n + sum(event_id). */
  def zorderTiles(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val bounds = ev.agg(
      min(col("user_id")).as("lo_u"), max(col("user_id")).as("hi_u"),
      min(col("us")).as("lo_t"), max(col("us")).as("hi_t"))
    val q = ev.crossJoin(broadcast(bounds))
      .withColumn("qx", expr("((user_id - lo_u) * 256) div (hi_u - lo_u + 1)"))
      .withColumn("qy", expr("((us - lo_t) * 256) div (hi_t - lo_t + 1)"))
      .withColumn("z", ZOrder.interleaveBits(col("qx"), col("qy"), 8))
    q.withColumn("tile", expr("z div 256"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_event_id"),
        min(col("qx")).as("min_qx"), max(col("qx")).as("max_qx"),
        min(col("qy")).as("min_qy"), max(col("qy")).as("max_qy"),
        min(col("z")).as("min_z"), max(col("z")).as("max_z"))
      .orderBy(col("tile"))
  }

  /** Unicode NFC canonicalization over `documents` via the codegen
    * `unicode_normalize` expression. The fixture corpus is ASCII, so the
    * query APPENDS a combining sequence ("e" + U+0301) to every prefix —
    * NFC composes it to a single "é", the char count drops by one, and
    * the normalized bytes are hash-compared against DuckDB's
    * `nfc_normalize`. This is the ingestion canonicalization step every
    * downstream exact-dup fingerprint / shingle join depends on. */
  def nfcNormalize(spark: SparkSession, dir: String): DataFrame = {
    val raw = concat(substring(col("text"), 1, 40), lit("é"))
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), nfc(raw).as("norm_text"),
        length(raw).as("raw_chars"), length(nfc(raw)).as("norm_chars"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB-side Morton interleave of the low 8 bits of x (even
    * positions) and y (odd): the same shift/mask/or tree the Spark
    * expression builds, rendered as SQL. */
  private def mortonSql(x: String, y: String): String =
    (0 until 8).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")

  private val skylineWhere =
    """WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE %s q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skyline_frontier" -> (skylineFrontier _),
    "skyline_brand" -> (skylineBrand _),
    "layout_zorder_tiles" -> (zorderTiles _),
    "text_nfc_normalize" -> (nfcNormalize _)
  )

  val oracles: Map[String, String] = Map(
    "skyline_frontier" ->
      s"""SELECT p_partkey, p_size, p_retailprice FROM part p
         |${skylineWhere.format("")}
         |ORDER BY p_partkey""".stripMargin,
    "skyline_brand" ->
      s"""SELECT p_brand, p_partkey, p_size, p_retailprice FROM part p
         |${skylineWhere.format("q.p_brand = p.p_brand AND")}
         |ORDER BY p_brand, p_partkey""".stripMargin,
    "layout_zorder_tiles" ->
      s"""WITH b AS (SELECT MIN(user_id) AS lo_u, MAX(user_id) AS hi_u,
         |                  MIN(epoch_us(ts)) AS lo_t, MAX(epoch_us(ts)) AS hi_t FROM events),
         |q AS (SELECT event_id,
         |             ((user_id - lo_u) * 256) // (hi_u - lo_u + 1) AS qx,
         |             ((epoch_us(ts) - lo_t) * 256) // (hi_t - lo_t + 1) AS qy
         |      FROM events, b),
         |z AS (SELECT event_id, qx, qy, ${mortonSql("qx", "qy")} AS z FROM q)
         |SELECT z // 256 AS tile, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
         |       MIN(qx) AS min_qx, MAX(qx) AS max_qx,
         |       MIN(qy) AS min_qy, MAX(qy) AS max_qy,
         |       MIN(z) AS min_z, MAX(z) AS max_z
         |FROM z GROUP BY tile ORDER BY tile""".stripMargin,
    "text_nfc_normalize" ->
      """SELECT doc_id, nfc_normalize(substr(text, 1, 40) || 'e' || chr(769)) AS norm_text,
        |       length(substr(text, 1, 40) || 'e' || chr(769)) AS raw_chars,
        |       length(nfc_normalize(substr(text, 1, 40) || 'e' || chr(769))) AS norm_chars
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
