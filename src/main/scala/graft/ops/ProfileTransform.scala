package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's entire in-flight "query": filter → drop columns → mask
  * PII → derive columns, from `/root/reference/smt/src/main/java/org/dorjee/
  * smt/UserProfileTransform.java` (92 LoC), re-expressed as one declarative
  * DataFrame transform.
  *
  * Exact semantics preserved (SURVEY.md §2.2):
  *  - T2 filter: a row is dropped when ANY filter column is null or blank
  *    after trim (java:30-37 — note `" "` drops too).
  *  - T3 drop: project-out the drop-list columns (java:40,59-60).
  *  - T4 mask: unconditional literal replacement of the mask column
  *    (java:61-62, `"redacted@email.com"`).
  *  - T5 identity projection of all remaining columns, nested structs
  *    passed through untouched (java:59-65).
  *  - T6 derive `full_name` = first + " " + last (java:69).
  *  - T7 derive `is_adult` = age != null && age >= threshold — null age
  *    yields `false`, not null (java:70-71) → `coalesce(age >= t, false)`.
  *  - T8 derive `processed_ts` = ISO-8601 instant (java:72). Wall-clock is
  *    nondeterministic, so the clock is injectable: `Some(instant)` for
  *    oracle-comparable output, `None` for `current_timestamp()`.
  *  - T9 output schema: Catalyst resolves it once at plan time — no
  *    memoization needed (java:16,41).
  *
  * All column names are parameters so the same operator runs over the
  * reference's `users` schema and over testdata stand-ins (FIXTURES.md §2:
  * `customer` plays `users`).
  */
final case class ProfileTransform(
    filterCols: Seq[String] = Seq("first_name", "last_name"),
    dropCols: Seq[String] = Seq("raw_password_hash", "internal_tracking_code"),
    maskCol: Option[String] = Some("email"),
    maskValue: String = "redacted@email.com",
    fullNameFrom: Option[(String, String)] = Some(("first_name", "last_name")),
    adultCol: Option[String] = Some("age"),
    adultThreshold: Int = 18,
    clock: Option[java.time.Instant] = None
) extends PipelineStage {

  val name = "profile-transform"

  /** T2's per-column predicate: non-null and non-blank after trim.
    * Java's `String.trim()` (java:35) strips every char <= U+0020 (tabs,
    * newlines, NULs — not just spaces like Spark/SQL `trim`), so "blank
    * after trim" == "no character above U+0020". */
  private def presentAfterTrim(c: String): Column =
    col(c).isNotNull && col(c).rlike("[^\\x00-\\x20]")

  def filterPredicate: Column =
    filterCols.map(presentAfterTrim).reduceOption(_ && _).getOrElse(lit(true))

  def apply(df: DataFrame): DataFrame = {
    val filtered = df.filter(filterPredicate)
    val dropped  = filtered.drop(dropCols: _*)
    val masked   = maskCol.fold(dropped)(c => dropped.withColumn(c, lit(maskValue)))
    val named = fullNameFrom.fold(masked) { case (f, l) =>
      masked.withColumn("full_name", concat_ws(" ", col(f), col(l)))
    }
    val adult = adultCol.fold(named) { c =>
      named.withColumn("is_adult", coalesce(col(c) >= lit(adultThreshold), lit(false)))
    }
    adult.withColumn("processed_ts", processedTs)
  }

  private def processedTs: Column = clock match {
    case Some(instant) => lit(instant.toString)
    // date_format renders in the SESSION timezone; shift the instant so
    // that rendering IS its UTC wall time before stamping the literal
    // 'Z' — on a non-UTC session the bare form labeled local time as
    // UTC, hours off the true instant (Instant.toString semantics, T8)
    case None => date_format(
      to_utc_timestamp(current_timestamp(), expr("current_timezone()")),
      "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
  }
}

object ProfileTransform {

  /** T1 tombstone passthrough (java:25) for Kafka-shaped frames: a row
    * whose value-struct column is null is emitted unchanged; non-null
    * values go through `transform` applied to the exploded struct. The
    * relational rendering keeps tombstones as all-null transformed fields
    * alongside the untouched key — callers re-wrap at the sink (T10).
    */
  def withTombstones(df: DataFrame, valueCol: String, t: ProfileTransform): DataFrame = {
    val live = t(df.filter(col(valueCol).isNotNull))
    val dead = df.filter(col(valueCol).isNull)
    // Align schemas: tombstones lack derived columns; fill with nulls.
    val missing = live.columns.filterNot(dead.columns.contains)
    val padded = missing.foldLeft(dead)((d, c) =>
      d.withColumn(c, lit(null).cast(live.schema(c).dataType)))
    live.unionByName(padded.select(live.columns.toIndexedSeq.map(col): _*))
  }
}
