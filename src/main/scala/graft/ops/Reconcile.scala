package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Source-vs-sink audit: the reference's verifier joins the Kafka topic and
  * the MinIO bucket by key and derives a per-key status
  * (`/root/reference/producer/verifier_ui.py:101-138`). Its dict-based
  * build — two hash maps keyed by `user_id`, iterate the sorted union of
  * key sets (:103-105) — is literally a full-outer hash equi-join with
  * sorted output; here it IS a `full_outer` join, so Catalyst can pick
  * broadcast-hash when one side is small and shuffled SMJ at 100 TB.
  *
  * Status semantics (verifier_ui.py:113-128):
  *   - source-only + expected-filtered predicate → "FILTERED (expected)"
  *   - source-only otherwise                     → "MISSING"
  *   - sink-only                                 → "ORPHAN"
  *   - sink leaks a dropped field                → "FAILED"
  *   - else                                      → "OK"
  */
object Reconcile {

  /** J2 last-writer-wins keying: the verifier's dict build keeps the LAST
    * occurrence of a duplicate key (verifier_ui.py:103-104). Exact parity
    * via `row_number` over (key, order desc) — one shuffle on the key,
    * which the subsequent keyed join reuses.
    *
    * Determinism (r14): `order` alone is not a total order — two records
    * sharing (key, order) would pick a shuffle-order-dependent winner
    * that can FLIP across runs and task retries. The remaining columns
    * (sorted by name) break ties descending; rows identical in every
    * column are interchangeable, so the output is a pure function of
    * the data under any partitioning. */
  def lastWriterWins(df: DataFrame, key: String, order: String): DataFrame = {
    // non-orderable columns (MapType) are skipped — they cannot appear
    // in an ORDER BY; ties break on the orderable remainder (Orderable)
    val tiebreak = graft.operators.Orderable
      .columns(df, df.columns.toSeq.filter(c => c != key && c != order))
      .sorted.map(col(_).desc)
    val w = Window.partitionBy(col(key))
      .orderBy(col(order).desc +: tiebreak.toIndexedSeq: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Full-outer reconciliation. `expectedFiltered` is evaluated against
    * source-side columns; `leaked` against sink-side columns (a non-null
    * value in a supposedly-dropped field = "FAILED",
    * verifier_ui.py:126-128).
    */
  def audit(
      source: DataFrame,
      sink: DataFrame,
      key: String,
      expectedFiltered: Column,
      leaked: Column): DataFrame = {
    val src = source.withColumn("__in_src", lit(true))
    val snk = sink.withColumn("__in_snk", lit(true))
    src
      .join(snk, Seq(key), "full_outer")
      .withColumn(
        "status",
        when(col("__in_snk").isNull && expectedFiltered, lit("FILTERED (expected)"))
          .when(col("__in_snk").isNull, lit("MISSING"))
          .when(col("__in_src").isNull, lit("ORPHAN"))
          .when(leaked, lit("FAILED"))
          .otherwise(lit("OK")))
      .drop("__in_src", "__in_snk")
      .orderBy(col(key))
  }

  /** A1/A2 count reconciliation (verifier_ui.py:154-158) as one pass over
    * the audit output instead of two table scans. */
  def summary(auditDf: DataFrame): DataFrame =
    auditDf.groupBy(col("status")).agg(count(lit(1)).as("n")).orderBy(col("status"))
}
