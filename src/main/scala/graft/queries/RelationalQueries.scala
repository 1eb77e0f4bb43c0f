package graft.queries

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{ProfileTransform, Reconcile}
import graft.sources.Tables

/** Registered queries: reference-parity (SURVEY.md §2.2-§2.3 — the SMT
  * transform and the verifier's reconciliation) plus the relational
  * gap-fill rows. Each query has a matching DuckDB oracle in
  * `RelationalQueries.oracles` with identical column names and a
  * deterministic total order.
  *
  * Determinism rules (SURVEY.md §5):
  *  - no wall-clock columns (T8 `processed_ts` gets an injected clock);
  *  - double aggregates go through decimal so sum order doesn't matter,
  *    then back to double the same way in both engines;
  *  - every ORDER BY ends in a unique key.
  */
object RelationalQueries {

  private val FixedClock = Instant.parse("2024-01-01T00:00:00Z")

  /** Fixture prep: `customer` plays the reference's `users` topic
    * (FIXTURES.md §2). Deterministically injects blank names (filter
    * fodder, ~1/13 rows) and carries two droppable "PII" columns, like the
    * producer fixture does (`/root/reference/producer/producer.py:46-61`).
    */
  def usersFromCustomer(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.select(
      col("c_custkey").as("user_id"),
      when(col("c_custkey") % 13 === 0, lit(" ")).otherwise(col("c_name")).as("first_name"),
      col("c_mktsegment").as("last_name"),
      concat(col("c_name"), lit("@example.com")).as("email"),
      col("c_acctbal").as("acctbal"),
      lit("secret123").as("raw_secret"),
      col("c_nationkey").cast("string").as("tracking"))
  }

  /** The SMT configured for the testdata stand-in schema. */
  def userTransform: ProfileTransform = ProfileTransform(
    filterCols = Seq("first_name", "last_name"),
    dropCols = Seq("raw_secret", "tracking"),
    maskCol = Some("email"),
    fullNameFrom = Some(("first_name", "last_name")),
    adultCol = Some("acctbal"),
    adultThreshold = 0,
    clock = Some(FixedClock))

  /** Simulated sink with deterministic anomalies so every audit status
    * (verifier_ui.py:113-128) appears: ~1/97 transformed rows go MISSING,
    * supplier-keyed ORPHAN rows appear sink-only, ~1/89 rows leak the
    * dropped `raw_secret` (FAILED). */
  def sinkFromUsers(spark: SparkSession, dir: String): DataFrame = {
    val transformed = userTransform(usersFromCustomer(spark, dir))
    val good = transformed
      .filter(col("user_id") % 97 =!= 0)
      .withColumn("raw_secret", when(col("user_id") % 89 === 0, lit("secret123")))
    val orphans = Tables.supplier(spark, dir).select(
      (col("s_suppkey") + lit(10000000L)).as("user_id"),
      lit("Orphan").as("first_name"),
      lit("SEG").as("last_name"),
      lit("redacted@email.com").as("email"),
      lit(0.0).as("acctbal"),
      lit("Orphan SEG").as("full_name"),
      lit(true).as("is_adult"),
      lit("2024-01-01T00:00:00Z").as("processed_ts"),
      lit(null).cast("string").as("raw_secret"))
    good.unionByName(orphans)
  }

  /** Flagship: full pipeline + audit (SURVEY.md §7.1). */
  def auditReconcile(spark: SparkSession, dir: String): DataFrame = {
    val src = usersFromCustomer(spark, dir)
      .select(col("user_id"), col("first_name").as("src_first_name"))
    val snk = sinkFromUsers(spark, dir).select(
      col("user_id"),
      col("full_name").as("snk_full_name"),
      col("email").as("snk_email"),
      col("is_adult").as("snk_is_adult"),
      col("raw_secret").as("snk_raw_secret"))
    Reconcile
      .audit(src, snk, "user_id",
        expectedFiltered = trim(col("src_first_name")) === "",
        leaked = col("snk_raw_secret").isNotNull)
      .select(
        col("user_id"), col("status"),
        col("snk_full_name").as("full_name"),
        col("snk_email").as("email"),
        col("snk_is_adult").as("is_adult"))
      .orderBy(col("user_id"))
  }

  /** Audit rollup: status counts (A1/A2, verifier_ui.py:154-158). */
  def auditSummary(spark: SparkSession, dir: String): DataFrame =
    Reconcile.summary(auditReconcile(spark, dir))

  /** The SMT transform itself as a standalone scan-shaped query (T2-T8). */
  def smtTransform(spark: SparkSession, dir: String): DataFrame =
    userTransform(usersFromCustomer(spark, dir)).orderBy(col("user_id"))

  /** TPC-H Q1-style pricing summary: partial-agg-friendly groupBy over the
    * fact table; doubles summed as decimals for cross-engine determinism. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(22, 6)))
          .cast("double").as("sum_disc_price"),
        (sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double") / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-style shipping priority: the classic 3-way
    * dim-filter → fact-join → group → top-k pipeline. Both join keys
    * arrive filtered (segment on customer, date windows on orders and
    * lineitem — all pushed to the scans), the filtered customer side
    * broadcasts, and the final top-10 is a `TakeOrderedAndProject`
    * (distributed heap merge, no global sort) — the shape that holds at
    * 100 TB because only k rows ever reach the driver side of the sort. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(22, 6))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style local supplier volume: the 6-way snowflake join —
    * region → nation → customer → orders → lineitem → supplier, with
    * the "local" constraint (supplier and customer share a nation)
    * applied as an extra equi-condition on the supplier join. All four
    * dim sides broadcast; the only big-big join is orders ⋈ lineitem
    * on the order key. */
  def q5LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(22, 6))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q10-style returned-item report: which customers returned the
    * most revenue in a quarter. Same all-broadcast dim topology as Q3
    * (nation broadcasts onto customer, filtered orders broadcast onto
    * lineitem), return-flag + date predicates pushed, top-20 via the
    * distributed heap. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(22, 6))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q18-style large-volume customers: orders whose total quantity
    * clears a threshold, found via a grouped-HAVING subquery that
    * Catalyst plans as an aggregate + LEFT SEMI join (the qualifying key
    * set never materializes wider than (key, flag)) — the "find the
    * whales, then hydrate them" shape. */
  def q18LargeVolumeCustomer(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity"))
    val qualifying = l.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("sq"))
      .filter(col("sq") > 180).select(col("l_orderkey").as("q_orderkey"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .join(qualifying, col("o_orderkey") === col("q_orderkey"), "left_semi")
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Cross-table referential-integrity audit — the reference's audit
    * identity (source-vs-sink reconciliation, `verifier_ui.py:103-111`)
    * generalized to the whole schema graph: for every FK edge, count
    * rows and orphans (left-anti join against the referenced key set).
    * Dim-side edges broadcast; the fact edges shuffle on the join key —
    * per-edge cost is ONE left-outer join producing both counts in a
    * single child-table pass (count(*) + count of null parent keys; the
    * r14 review killed the two-scan shape, which read each child twice —
    * three avoidable full lineitem scans in one query). Parent keys are
    * primary keys, so the left join cannot fan out and the null-count
    * equals the anti-join count exactly. */
  def auditReferential(spark: SparkSession, dir: String): DataFrame = {
    val edges: Seq[(String, DataFrame, String, DataFrame, String)] = Seq(
      ("orders->customer", Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey"),
      ("lineitem->orders", Tables.lineitem(spark, dir), "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey"),
      ("lineitem->part", Tables.lineitem(spark, dir), "l_partkey",
        Tables.part(spark, dir), "p_partkey"),
      ("lineitem->supplier", Tables.lineitem(spark, dir), "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"),
      ("customer->nation", Tables.customer(spark, dir), "c_nationkey",
        Tables.nation(spark, dir), "n_nationkey"),
      ("supplier->nation", Tables.supplier(spark, dir), "s_nationkey",
        Tables.nation(spark, dir), "n_nationkey"),
      ("nation->region", Tables.nation(spark, dir), "n_regionkey",
        Tables.region(spark, dir), "r_regionkey"))
    edges.map { case (name, child, fk, parent, pk) =>
      child.select(col(fk).as("_fk"))
        .join(parent.select(col(pk).as("_pk")),
          col("_fk") === col("_pk"), "left_outer")
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(when(col("_pk").isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_orphans"))
        .select(lit(name).as("edge"), col("n_rows"), col("n_orphans"))
    }.reduce(_.union(_)).orderBy(col("edge"))
  }

  /** Typed per-key MERGE through `KeyValueGroupedDataset.cogroup` — the
    * §2.10 Dataset primitive the registry had not yet exercised: both
    * sides co-partition on the key in ONE shuffle each and the merge
    * function sees each key's two row streams together. The primitive
    * earns its keep when per-key logic exceeds relational algebra
    * (sequence alignment, custom conflict resolution); THIS instance is
    * deliberately relational — order-header vs line-detail consistency
    * with exact-decimal line totals — so the full-outer-join oracle can
    * prove the cogroup path row-for-row. Decimal accumulation in the
    * merge keeps the emitted double independent of line order. */
  def auditCogroupDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cogroupDiff(
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)],
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice")).as[(Long, Double)])
  }

  /** The cogroup merge itself, parameterized so synthetic specs can
    * drive the arms the fixture data never produces (the testdata has
    * no orphan lines — every l_orderkey exists in orders). */
  def cogroupDiff(orders: org.apache.spark.sql.Dataset[(Long, Double)],
      lines: org.apache.spark.sql.Dataset[(Long, Double)]): DataFrame = {
    import orders.sparkSession.implicits._
    orders.groupByKey(_._1).cogroup(lines.groupByKey(_._1)) { (key, os, ls) =>
      val hasOrder = os.nonEmpty
      var n = 0L
      var total = BigDecimal(0).setScale(2)
      ls.foreach { l =>
        n += 1
        total += BigDecimal(l._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      }
      val status =
        if (!hasOrder) "orphan_lines"
        else if (n == 0L) "empty_order"
        else "ok"
      Iterator((key, status, n, total.toDouble))
    }.toDF("order_key", "status", "n_lines", "line_total")
      .orderBy(col("order_key"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "audit_reconcile" -> (auditReconcile _),
    "audit_cogroup_diff" -> (auditCogroupDiff _),
    "audit_summary" -> (auditSummary _),
    "audit_referential" -> (auditReferential _),
    "smt_transform" -> (smtTransform _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier_volume" -> (q5LocalSupplierVolume _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q18_large_volume_customer" -> (q18LargeVolumeCustomer _)
  )

  private val usersCte =
    """users AS (
      |  SELECT c_custkey AS user_id,
      |         CASE WHEN c_custkey % 13 = 0 THEN ' ' ELSE c_name END AS first_name,
      |         c_mktsegment AS last_name,
      |         c_name || '@example.com' AS email,
      |         c_acctbal AS acctbal,
      |         'secret123' AS raw_secret,
      |         CAST(c_nationkey AS VARCHAR) AS tracking
      |  FROM customer
      |)""".stripMargin

  private val transformedCte =
    """transformed AS (
      |  SELECT user_id, first_name, last_name,
      |         'redacted@email.com' AS email,
      |         acctbal,
      |         concat_ws(' ', first_name, last_name) AS full_name,
      |         coalesce(acctbal >= 0, false) AS is_adult,
      |         '2024-01-01T00:00:00Z' AS processed_ts
      |  FROM users
      |  WHERE trim(first_name) <> '' AND trim(last_name) <> ''
      |)""".stripMargin

  private val sinkCte =
    """sink AS (
      |  SELECT user_id, first_name, last_name, email, acctbal, full_name,
      |         is_adult, processed_ts,
      |         CASE WHEN user_id % 89 = 0 THEN 'secret123' END AS raw_secret
      |  FROM transformed WHERE user_id % 97 <> 0
      |  UNION ALL
      |  SELECT 10000000 + s_suppkey, 'Orphan', 'SEG', 'redacted@email.com',
      |         0.0, 'Orphan SEG', true, '2024-01-01T00:00:00Z', NULL
      |  FROM supplier
      |)""".stripMargin

  private val auditSelect =
    """SELECT coalesce(u.user_id, s.user_id) AS user_id,
      |       CASE WHEN s.user_id IS NULL AND trim(u.first_name) = '' THEN 'FILTERED (expected)'
      |            WHEN s.user_id IS NULL THEN 'MISSING'
      |            WHEN u.user_id IS NULL THEN 'ORPHAN'
      |            WHEN s.raw_secret IS NOT NULL THEN 'FAILED'
      |            ELSE 'OK' END AS status,
      |       s.full_name AS full_name, s.email AS email, s.is_adult AS is_adult
      |FROM users u FULL OUTER JOIN sink s ON u.user_id = s.user_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "audit_reconcile" ->
      s"""WITH $usersCte, $transformedCte, $sinkCte
         |$auditSelect
         |ORDER BY user_id""".stripMargin,
    // the relational mirror of the typed cogroup merge: full-outer on
    // the order key with exact-decimal line totals
    "audit_cogroup_diff" ->
      """WITH l AS (
        |  SELECT l_orderkey, COUNT(*) AS n_lines,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS line_total
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT COALESCE(o.o_orderkey, l.l_orderkey) AS order_key,
        |       CASE WHEN o.o_orderkey IS NULL THEN 'orphan_lines'
        |            WHEN l.l_orderkey IS NULL THEN 'empty_order'
        |            ELSE 'ok' END AS status,
        |       COALESCE(l.n_lines, 0) AS n_lines,
        |       CAST(COALESCE(l.line_total, 0.00) AS DOUBLE) AS line_total
        |FROM orders o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey
        |ORDER BY order_key""".stripMargin,
    "audit_summary" ->
      s"""WITH $usersCte, $transformedCte, $sinkCte,
         |audit AS ($auditSelect)
         |SELECT status, count(*) AS n FROM audit GROUP BY status ORDER BY status""".stripMargin,
    "smt_transform" ->
      s"""WITH $usersCte, $transformedCte
         |SELECT * FROM transformed ORDER BY user_id""".stripMargin,
    "audit_referential" ->
      """SELECT 'orders->customer' AS edge,
        |       (SELECT COUNT(*) FROM orders) AS n_rows,
        |       (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |         AS n_orphans
        |UNION ALL
        |SELECT 'lineitem->orders',
        |       (SELECT COUNT(*) FROM lineitem),
        |       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |UNION ALL
        |SELECT 'lineitem->part',
        |       (SELECT COUNT(*) FROM lineitem),
        |       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |          (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |UNION ALL
        |SELECT 'lineitem->supplier',
        |       (SELECT COUNT(*) FROM lineitem),
        |       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |          (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |UNION ALL
        |SELECT 'customer->nation',
        |       (SELECT COUNT(*) FROM customer),
        |       (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
        |          (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        |UNION ALL
        |SELECT 'supplier->nation',
        |       (SELECT COUNT(*) FROM supplier),
        |       (SELECT COUNT(*) FROM supplier s WHERE NOT EXISTS
        |          (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
        |UNION ALL
        |SELECT 'nation->region',
        |       (SELECT COUNT(*) FROM nation),
        |       (SELECT COUNT(*) FROM nation n WHERE NOT EXISTS
        |          (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
        |ORDER BY edge""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q18_large_volume_customer" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin
  )
}
