package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MaskFunctions
import graft.operators.AsOfJoin
import graft.sources.Tables

/** Extension operators past the reference surface: as-of join, range
  * join, generalized PII masking, pivot, exact percentiles — each with a
  * DuckDB oracle.
  */
object ExtendedQueries {

  /** As-of: each purchase event matched to the user's latest signup at or
    * before it (union+carry-forward single-shuffle plan). */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = ev // all events as left keeps the output rich
    val signups = Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin.joinAsOf(purchases, signups,
      leftKey = "user_id", rightKey = "user_id",
      leftTs = "ts", rightTs = "ts", tiebreak = "event_id")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("r_event_id"), col("r_ts"))
      .orderBy(col("event_id"))
  }

  /** Range join: events of the same user in the preceding hour.
    * Equi-key + range predicate → SMJ with range filter, not a cross
    * product. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    // r19 (guide §3.3): the user_id-only equi-join expanded to every
    // same-user pair before the range predicate could prune — 6.77M
    // intermediate rows for 9,244 survivors at sf0.1, and per-user
    // history spans ~700 hours so the blowup GROWS with history depth
    // at estate scale. Adding the 1-hour time bucket to the equi-key
    // makes the join see only bucket-mates: a qualifying b with
    // a_ts − 1h ≤ b_ts < a_ts lies in the same or previous 1-hour
    // bucket as a_ts (bucket width == interval width), so probing
    // exactly those two buckets finds every qualifying pair, each
    // exactly once (a b row's bucket matches one of the two exploded
    // probe rows). Unmatched probes survive the left join on both
    // exploded rows and count(b_ts) ignores their nulls, so the
    // per-event counts are unchanged. Bucket ids use integral division
    // of unix_micros — exact, and floor-equivalent for the post-epoch
    // instants events carry.
    val hourUs = 3600L * 1000000L
    val a = Tables.spreadForCompute(Tables.events(spark, dir), col("event_id"))
      .select(
        col("event_id").as("a_event_id"), col("user_id").as("a_user_id"),
        col("ts").as("a_ts"))
      .withColumn("bk", explode(array(
        expr(s"unix_micros(a_ts) div $hourUs") - 1,
        expr(s"unix_micros(a_ts) div $hourUs"))))
    val b = Tables.events(spark, dir).select(
      col("user_id").as("b_user_id"), col("ts").as("b_ts"),
      expr(s"unix_micros(ts) div $hourUs").as("bk"))
    a.join(b,
        col("a_user_id") === col("b_user_id") &&
          a("bk") === b("bk") &&
          col("b_ts") >= col("a_ts") - expr("INTERVAL 1 HOUR") &&
          col("b_ts") < col("a_ts"),
        "left_outer")
      .groupBy(col("a_event_id"))
      .agg(count(col("b_ts")).as("n_prior_events"))
      .select(col("a_event_id").as("event_id"), col("n_prior_events"))
      .orderBy(col("event_id"))
  }

  /** Generalized masking (T4 extensions): literal, domain-preserving
    * email redaction, salted hash pseudonym, partial mask. */
  def maskPii(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        MaskFunctions.literalMask().as("email_masked"),
        MaskFunctions.redactEmailLocal(
          concat(col("c_name"), lit("@corp.example"))).as("email_domain_kept"),
        MaskFunctions.hashMask(col("c_name"), "pepper1").as("name_token"),
        MaskFunctions.partialMask(col("c_name"), 4).as("name_partial"))
      .orderBy(col("c_custkey"))

  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  /** Pivot: customer counts, nation × market segment. */
  def pivotSegments(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val pivoted = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("c_mktsegment", segments)
      .agg(count(lit(1)))
    pivoted
      .select(col("n_name") +: segments.map(s => coalesce(col(s), lit(0L)).as(s)): _*)
      .orderBy(col("n_name"))
  }

  /** Exact linear-interpolation percentiles (rounded to 6 dp — Spark and
    * DuckDB agree up to last-ulp interpolation noise). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.25D, 0.5D, 0.9D))").as("qs"))
      .select(col("event_type"),
        round(element_at(col("qs"), 1), 6).as("q25"),
        round(element_at(col("qs"), 2), 6).as("q50"),
        round(element_at(col("qs"), 3), 6).as("q90"))
      .orderBy(col("event_type"))

  /** Salted skew join whose oracle is the PLAIN join — the proof that
    * salting changes the plan, not the result. */
  def saltedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    graft.operators.Salting.saltedJoin(orders, customer, "o_custkey", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  /** J2 last-writer-wins keying through its operator (Reconcile):
    * latest event per user by (ts, event_id). */
  def lastWriterWins(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Reconcile.lastWriterWins(
      Tables.events(spark, dir), key = "user_id", order = "event_id")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))

  /** Bounded-memory approximate percentiles (GK-style
    * `approx_percentile`, the 100 TB alternative to exact sort-based
    * percentiles) UNDER the oracle gate (VERDICT r9 ask #8, previously
    * rows-only): the estimates are engine-private, so the gated
    * relation emits the EXACT percentile pair (cross-engine, the
    * agg_percentiles formulation) plus per-quantile boolean BRACKETS —
    * |approx − exact| ≤ max(5%·|exact|, 1e-6), the
    * ApproxValidationSpec bound — which the oracle pins TRUE. An
    * estimate leaving its error budget fails the gate as a hash
    * mismatch instead of hiding behind `no_oracle`. */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    def inBounds(a: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
      abs(a - e) <= greatest(abs(e) * lit(0.05), lit(1e-6))
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, array(0.5D, 0.9D), 1000)").as("qa"),
        expr("percentile(value, array(0.5D, 0.9D))").as("qe"))
      .select(col("event_type"),
        round(element_at(col("qe"), 1), 6).as("p50_exact"),
        round(element_at(col("qe"), 2), 6).as("p90_exact"),
        inBounds(element_at(col("qa"), 1), element_at(col("qe"), 1))
          .as("p50_in_bounds"),
        inBounds(element_at(col("qa"), 2), element_at(col("qe"), 2))
          .as("p90_in_bounds"))
      .orderBy(col("event_type"))
  }

  /** Frequent-items sketch (df.stat.freqItems — Karp et al. one-pass
    * heavy hitters, support-bounded state, no full groupBy) UNDER the
    * oracle gate via its COVERAGE LAW (VERDICT r9 ask #8): every item
    * whose true frequency exceeds support·n must be nominated by the
    * sketch — false positives are allowed, false negatives are not.
    * The gated relation is each EXACT heavy hitter (event_type at 5%
    * support: all five ~20% types qualify) with its exact count and
    * the sketch-membership flag, which the oracle pins TRUE. The exact
    * count table rides along only to form the bracket. */
  def freqItems(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val nominated = ev.stat.freqItems(Array("event_type"), 0.05)
      .select(explode(col("event_type_freqItems")).as("event_type"))
      .withColumn("in_sketch", lit(true))
    val counts = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .filter(col("n").cast("double") > col("total").cast("double") * 0.05)
      .join(nominated, Seq("event_type"), "left")
      .select(col("event_type"), col("n"),
        coalesce(col("in_sketch"), lit(false)).as("covered"))
      .orderBy(col("event_type"))
  }

  /** The advise→salt→join loop END TO END over real data (VERDICT r9
    * ask #4 — [[graft.operators.Salting.advise]] was spec-tested but no
    * registered query ran the full loop): the CMS + freqItems sketch
    * pass measures the big side's event_type histogram (bounded state
    * at any corpus size), prescribes the salt factor — each of the 5
    * types carries ≈20%, so ceil(0.2 × 32) ≈ 7 — and
    * [[graft.operators.Salting.saltedJoin]] splits every hot key that
    * many ways. The dim side is a per-type aggregate; its `merge` hint
    * pins the shuffled-join path because the regime this loop exists
    * for is the NON-broadcastable medium side (a million-row entity
    * table at 100 TB), and a 5-row broadcast would optimize the demo
    * away. Salting is semantics-preserving, so the oracle is the
    * literal UNSALTED join; the above-type-average comparison runs on
    * integer micro-units (value_micro · n > Σ micro) so no engine pair
    * can disagree on a boundary. NOTE: `advise` executes two sketch
    * jobs at DataFrame-CONSTRUCTION time (the profiling step a
    * deployment runs while planning the join) — like
    * `pipeline_observe_metrics`, building this frame is not free.
    * DedupSkewSpec's real-data receipt asserts the hottest key's
    * max-task rows actually drop vs the unsalted plan. */
  def advisedSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Salting
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        round(col("value") * lit(1e6)).cast("long").as("value_micro"))
    val dim = ev.groupBy(col("event_type"))
      .agg(sum(col("value_micro")).as("sum_micro"),
        count(lit(1)).as("n_type"))
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val advice = Salting.advise(ev, "event_type", parts)
    Salting.saltedJoin(ev, dim.hint("merge"), "event_type", advice.salts)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value_micro").cast(
            org.apache.spark.sql.types.DecimalType(38, 0)) * col("n_type")
          > col("sum_micro"), 1L).otherwise(0L)).as("n_above_type_avg"))
      .orderBy(col("user_id"))
  }

  /** Skew DIAGNOSTICS for a join/agg key — the profiling step a 100 TB
    * deployment runs before choosing salting/AQE settings: per-key
    * count distribution (max share, p50/p99, skew ratio) plus a
    * suggested salt factor = ceil(max_share × 32 partitions), i.e. how
    * many ways the hottest key must split to stop dominating one
    * shuffle partition. One groupBy + one scalar agg; the percentile
    * pair runs on the (small) per-key count table, not the fact table. */
  def diagKeySkew(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    counts.agg(
      sum(col("cnt")).cast("bigint").as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_key_rows"),
      round(max(col("cnt")).cast("double") / sum(col("cnt")).cast("double"), 6)
        .as("max_share"),
      round(expr("percentile(cnt, 0.5D)"), 6).as("p50_key_rows"),
      round(expr("percentile(cnt, 0.99D)"), 6).as("p99_key_rows"),
      round(expr("percentile(cnt, 0.99D) / percentile(cnt, 0.5D)"), 6)
        .as("skew_ratio"))
      .withColumn("suggested_salt",
        greatest(lit(1L), ceil(col("max_share") * lit(32))).cast("bigint"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "diag_key_skew" -> (diagKeySkew _),
    "agg_approx_percentiles" -> (approxPercentiles _),
    "freq_items" -> (freqItems _),
    "salted_join" -> (saltedJoinQuery _),
    "advised_salted_join" -> (advisedSaltedJoin _),
    "last_writer_wins" -> (lastWriterWins _),
    "asof_join" -> (asofJoin _),
    "range_join" -> (rangeJoin _),
    "mask_pii" -> (maskPii _),
    "pivot_segments" -> (pivotSegments _),
    "agg_percentiles" -> (percentiles _)
  )

  val oracles: Map[String, String] = Map(
    "diag_key_skew" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
        |SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |       COUNT(*) AS n_keys,
        |       MAX(cnt) AS max_key_rows,
        |       round(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
        |         AS max_share,
        |       round(quantile_cont(cnt, 0.5), 6) AS p50_key_rows,
        |       round(quantile_cont(cnt, 0.99), 6) AS p99_key_rows,
        |       round(quantile_cont(cnt, 0.99) / quantile_cont(cnt, 0.5), 6)
        |         AS skew_ratio,
        |       CAST(GREATEST(1, CEIL(
        |         round(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
        |           * 32)) AS BIGINT) AS suggested_salt
        |FROM c""".stripMargin,
    // the literal UNSALTED join: salting is semantics-preserving, so
    // the oracle proving that IS the point of the query
    "advised_salted_join" ->
      """WITH e AS (
        |  SELECT event_type, user_id,
        |         CAST(ROUND(value * 1e6) AS BIGINT) AS value_micro
        |  FROM events),
        |d AS (
        |  SELECT event_type, SUM(value_micro) AS sum_micro,
        |         COUNT(*) AS n_type
        |  FROM e GROUP BY event_type)
        |SELECT e.user_id, COUNT(*) AS n_events,
        |       CAST(SUM(CASE WHEN CAST(e.value_micro AS HUGEINT) * d.n_type
        |                          > d.sum_micro
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above_type_avg
        |FROM e JOIN d USING (event_type)
        |GROUP BY e.user_id
        |ORDER BY e.user_id""".stripMargin,
    "salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "last_writer_wins" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "asof_join" ->
      """WITH s AS (
        |  SELECT event_id, user_id, ts FROM (
        |    SELECT event_id, user_id, ts,
        |           ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'signup') WHERE rn = 1)
        |SELECT e.event_id, e.user_id, e.ts,
        |       s.event_id AS r_event_id, s.ts AS r_ts
        |FROM events e ASOF LEFT JOIN s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY e.event_id""".stripMargin,
    "range_join" ->
      """SELECT a.event_id, COUNT(b.ts) AS n_prior_events
        |FROM events a LEFT JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin,
    "mask_pii" ->
      """SELECT c_custkey,
        |       'redacted@email.com' AS email_masked,
        |       regexp_replace(c_name || '@corp.example', '^[^@]+', 'redacted') AS email_domain_kept,
        |       sha256('pepper1' || c_name) AS name_token,
        |       repeat('*', greatest(length(c_name) - 4, 0)) || right(c_name, 4) AS name_partial
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "pivot_segments" ->
      """SELECT n_name,
        |       COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS "AUTOMOBILE",
        |       COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS "BUILDING",
        |       COUNT(*) FILTER (WHERE c_mktsegment = 'FURNITURE') AS "FURNITURE",
        |       COUNT(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS "HOUSEHOLD",
        |       COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS "MACHINERY"
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "agg_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.25), 6) AS q25,
        |       round(quantile_cont(value, 0.5), 6) AS q50,
        |       round(quantile_cont(value, 0.9), 6) AS q90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // sketch brackets (r9 ask #8): exact side cross-engine, the
    // in-bounds / coverage flag pinned TRUE
    "agg_approx_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 6) AS p50_exact,
        |       round(quantile_cont(value, 0.9), 6) AS p90_exact,
        |       TRUE AS p50_in_bounds,
        |       TRUE AS p90_in_bounds
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "freq_items" ->
      """WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT SUM(n) AS total FROM c)
        |SELECT event_type, n, TRUE AS covered
        |FROM c, t
        |WHERE CAST(n AS DOUBLE) > CAST(total AS DOUBLE) * 0.05
        |ORDER BY event_type""".stripMargin
  )
}
