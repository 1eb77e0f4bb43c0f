package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog apply (MERGE INTO semantics): fold a CDC stream of
  * insert/update/delete records into a base snapshot.
  *
  * The reference pipeline lands raw Kafka records append-only
  * (`connectors/s3-sink.json` — no compaction, no upsert); a consumer of
  * that layout who wants current state has to replay the log. This
  * operator is that replay as a relation: last-writer-wins per key over
  * the changelog, then a single keyed merge with the snapshot.
  *
  * Scale shape (the reason this is not a window query): the
  * latest-per-key step is `max_by(struct(payload), seq)` — ONE hash
  * aggregate with map-side partial combine, so each map task forwards at
  * most one candidate row per key it saw, and nothing is globally
  * sorted. The merge is ONE full-outer equi-join on the key; at 100 TB
  * the changelog has already collapsed to |distinct keys| before it
  * reaches the join, and Catalyst picks broadcast-hash when that
  * residue is small. A `row_number()` window would instead shuffle and
  * sort every changelog record.
  *
  * Semantics per key (op of the max-seq record wins; seq ties broken by
  * the struct's remaining fields, so callers should pass a unique seq):
  *   - no changelog record        → snapshot row kept
  *   - latest op = "D"            → row absent from the result
  *   - latest op = "U"/"I"        → upsert; each payload column
  *     overwrites the snapshot value when non-null (partial update),
  *     otherwise the snapshot value survives
  *
  * Result = snapshot schema + a `change` status column
  * (kept | updated | inserted).
  */
object CdcMerge {

  /** Stage 1 — last-writer-wins compaction: the latest record per key,
    * op exposed as `__op` and payload columns renamed `__chg_*` so the
    * merge join can coalesce column-wise without ambiguity. Works on a
    * batch OR streaming changelog (a plain streaming aggregation whose
    * state is exactly the CDC bound: one buffered row per live key). */
  def latestPerKey(changelog: DataFrame, key: String, seq: String,
      op: String): DataFrame = {
    val payload = changelog.columns.filterNot(Set(key, seq, op)).toSeq
    // the ordering key is a STRUCT (seq, op, payload...), not bare seq:
    // max_by compares ONLY its ordering expression — with bare seq, tied
    // seqs picked whichever partial aggregate merged first (output
    // flipping across repartitioning/retries/micro-batch slicing). The
    // lexicographic struct makes the winner a pure function of the data
    // (fully identical rows are interchangeable), which is what the
    // scaladoc's tiebreak promise requires. Non-orderable payload
    // columns (MapType) are excluded from the ORDERING struct only —
    // they still ride in the value struct; ties then break on the
    // orderable columns alone (best-effort determinism, see Orderable).
    val tiebreak = Orderable.columns(changelog, payload)
    changelog
      .groupBy(col(key))
      .agg(max_by(struct((op +: payload).map(col): _*),
        struct((seq +: op +: tiebreak).map(col): _*)).as("__c"))
      .select(col(key) +: col(s"__c.$op").as("__op") +:
        payload.map(c => col(s"__c.$c").as(s"__chg_$c")): _*)
  }

  /** Stage 2 — apply an already-compacted `latest` frame (the
    * [[latestPerKey]] shape) to the snapshot. */
  def applyLatest(snapshot: DataFrame, latest: DataFrame, key: String): DataFrame = {
    val payload = latest.columns.collect {
      case c if c.startsWith("__chg_") => c.stripPrefix("__chg_")
    }.toSeq
    require(payload.forall(snapshot.columns.contains),
      s"changelog payload ${payload.mkString(",")} must be snapshot columns")
    val snap = snapshot.withColumn("__in_snap", lit(true))
    val outCols = snapshot.columns.toSeq.map {
      case `key` => col(key)
      case c if payload.contains(c) => coalesce(col(s"__chg_$c"), col(c)).as(c)
      case c => col(c)
    }
    snap
      .join(latest, Seq(key), "full_outer")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select(outCols :+
        when(col("__op").isNull, lit("kept"))
          .when(col("__in_snap").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("change"): _*)
  }

  /** @param snapshot  base state, one row per `key`
    * @param changelog columns: `key`, `seq`, `op` ("I"|"U"|"D") plus any
    *                  subset of the snapshot's non-key columns as payload
    */
  def upsert(snapshot: DataFrame, changelog: DataFrame,
      key: String, seq: String, op: String): DataFrame =
    applyLatest(snapshot, latestPerKey(changelog, key, seq, op), key)
}
