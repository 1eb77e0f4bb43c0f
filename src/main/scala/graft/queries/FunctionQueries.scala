package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scalar-function coverage wave: calendar/epoch/interval arithmetic,
  * the advanced string surface (edit distance, padding, translate,
  * split_part), and MapType (JSON-object → map, key explode). Each query
  * is a single scan-shaped pass; cross-engine alignment notes sit next
  * to each mismatch-prone function.
  */
object FunctionQueries {

  /** Calendar parts + epoch + day arithmetic on the events stream.
    * Alignment: Spark `dayofweek` is 1=Sunday..7; DuckDB `dayofweek` is
    * 0=Sunday..6 — normalized to the DuckDB convention here. Epoch
    * seconds floor (Spark unix_timestamp truncates; DuckDB epoch() keeps
    * the fraction, so the oracle floors explicitly). */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"),
        hour(col("ts")).as("h"),
        (dayofweek(col("ts")) - 1).as("dow"),
        unix_timestamp(col("ts")).as("epoch_s"),
        datediff(col("ts").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
        (col("ts") + expr("INTERVAL 90 DAYS")).as("ts_plus_90d"))
      .orderBy(col("event_id"))

  /** Advanced string surface on one scan: edit distance, padding,
    * character translate, indexed split, substring position. */
  def stringFuncs2(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        levenshtein(col("c_name"), lit("Customer#000000000")).as("edit_dist"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded_key"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("deviled_seg"),
        split_part(col("c_name"), lit("#"), lit(2)).as("name_num"),
        instr(col("c_name"), "#").as("hash_pos"))
      .orderBy(col("c_custkey"))

  /** MapType surface: parse the JSON props object into map<string,string>,
    * explode the key set, count key occurrences corpus-wide (the
    * schema-on-read shape for semi-structured event props). */
  def mapExplode(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(explode(map_keys(from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))).as("key"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("key"))

  /** Right-outer join: every supplier's nation row survives even with no
    * matching supplier (complements join_left_outer / the full-outer
    * flagship). */
  def joinRightOuter(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir),
        col("s_nationkey") === col("n_nationkey"), "right_outer")
      .groupBy(col("n_name"))
      .agg(count(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("n_name"))

  /** The SQL entry point with correlated subqueries: EXISTS (planned as
    * a left-semi join) and a scalar subquery (planned as a broadcast
    * single-row aggregate) in one statement — exercising
    * `spark.sql(...)` rather than the DataFrame DSL. */
  def sqlExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    // the scalar threshold routes through an exact decimal sum (repo
    // determinism rule) so the > comparison is engine-independent
    spark.sql(
      """SELECT c.c_custkey, c.c_mktsegment
        |FROM customer_v c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders_v o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_totalprice > (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |                                 / COUNT(*) * 1.5
        |                          FROM orders_v o2))
        |ORDER BY c.c_custkey""".stripMargin)
  }

  /** CORRELATED scalar subquery (the shape [[sqlExistsSubquery]]'s
    * uncorrelated threshold doesn't cover): each order compared against
    * ITS customer's max — Catalyst decorrelates to a per-key aggregate
    * plus an equi-join, so the "subquery per row" reading costs one
    * grouped pass, not O(rows) rescans. */
  def sqlCorrelatedScalar(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
        |FROM orders_v o
        |WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice)
        |                        FROM orders_v o2
        |                        WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_custkey, o.o_orderkey""".stripMargin)
  }

  /** LATERAL correlated derived table: top-2 orders PER customer via a
    * per-row subquery with ORDER BY + LIMIT — decorrelated by Catalyst
    * into a partitioned rank filter, not a per-customer rescan. */
  def sqlLateralTopn(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer_v c,
        |LATERAL (SELECT o.o_orderkey, o.o_totalprice
        |         FROM orders_v o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o.o_totalprice DESC, o.o_orderkey
        |         LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin)
  }

  /** Recursive CTE (SQL:1999, Spark 4's WITH RECURSIVE): an 80-month
    * calendar spine generated by recursion, left-joined to sparse
    * high-value orders so empty months SURVIVE as zero rows — the
    * gap-filling shape every resampled time series needs and plain
    * GROUP BY cannot produce (it only yields months that have data;
    * at sf0.01, 11 of the 80 months are gap-filled zeros). The
    * recursion itself is driver-cheap (80 rows); the join and rollup
    * stay distributed. */
  def sqlRecursiveSpine(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """WITH RECURSIVE spine(m) AS (
        |  SELECT TIMESTAMP '1995-01-01'
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM spine WHERE m < TIMESTAMP '2001-08-01')
        |SELECT s.m, COUNT(o.o_orderkey) AS n_orders,
        |       COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS revenue
        |FROM spine s LEFT JOIN orders_v o
        |  ON date_trunc('month', o.o_orderdate) = s.m AND o.o_totalprice > 495000
        |GROUP BY s.m
        |ORDER BY s.m""".stripMargin)
  }

  /** Outer generator semantics: explode_outer keeps rows whose array is
    * empty (as a null element) — short documents survive the shingle
    * explode instead of silently vanishing. */
  def explodeOuter(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode_outer(graft.functions.TextFunctions.shingles(col("text"), 3)).as("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("shingle")).as("n_shingles"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "explode_outer" -> (explodeOuter _),
    "date_funcs" -> (dateFuncs _),
    "string_funcs2" -> (stringFuncs2 _),
    "map_explode" -> (mapExplode _),
    "join_right_outer" -> (joinRightOuter _),
    "sql_exists_subquery" -> (sqlExistsSubquery _),
    "sql_correlated_scalar" -> (sqlCorrelatedScalar _),
    "sql_lateral_topn" -> (sqlLateralTopn _),
    "sql_recursive_spine" -> (sqlRecursiveSpine _)
  )

  val oracles: Map[String, String] = Map(
    // outer-explode emulation: empty shingle lists become [NULL] so the
    // doc keeps exactly one row; COUNT(col) skips the null
    "explode_outer" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(w) >= 3
        |              THEN list_distinct(list_transform(range(len(w)-2),
        |                     i -> array_to_string(w[i+1:i+3], ' ')))
        |              ELSE [] END AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |        FROM documents)),
        |x AS (
        |  SELECT doc_id,
        |         unnest(CASE WHEN len(s) = 0 THEN [NULL] ELSE s END) AS shingle
        |  FROM sh)
        |SELECT doc_id, COUNT(*) AS n_rows, COUNT(shingle) AS n_shingles
        |FROM x GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "date_funcs" ->
      """SELECT event_id,
        |       year(ts) AS y, month(ts) AS m, dayofmonth(ts) AS d,
        |       hour(ts) AS h, dayofweek(ts) AS dow,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |       date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS days_since,
        |       ts + INTERVAL 90 DAY AS ts_plus_90d
        |FROM events ORDER BY event_id""".stripMargin,
    "string_funcs2" ->
      """SELECT c_custkey,
        |       levenshtein(c_name, 'Customer#000000000') AS edit_dist,
        |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
        |       translate(c_mktsegment, 'AEIOU', 'aeiou') AS deviled_seg,
        |       split_part(c_name, '#', 2) AS name_num,
        |       strpos(c_name, '#') AS hash_pos
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "map_explode" ->
      """SELECT key, COUNT(*) AS n_rows
        |FROM (SELECT unnest(json_keys(props)) AS key FROM events)
        |GROUP BY key ORDER BY key""".stripMargin,
    "join_right_outer" ->
      """SELECT n_name, COUNT(s_suppkey) AS n_suppliers
        |FROM supplier RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "sql_exists_subquery" ->
      """SELECT c.c_custkey, c.c_mktsegment
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_totalprice > (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |                                 / COUNT(*) * 1.5
        |                          FROM orders o2))
        |ORDER BY c.c_custkey""".stripMargin,
    "sql_correlated_scalar" ->
      """SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice)
        |                        FROM orders o2
        |                        WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_custkey, o.o_orderkey""".stripMargin,
    "sql_lateral_topn" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o.o_orderkey, o.o_totalprice
        |         FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o.o_totalprice DESC, o.o_orderkey
        |         LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin,
    "sql_recursive_spine" ->
      """WITH RECURSIVE spine(m) AS (
        |  SELECT TIMESTAMP '1995-01-01'
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM spine WHERE m < TIMESTAMP '2001-08-01')
        |SELECT s.m, COUNT(o.o_orderkey) AS n_orders,
        |       COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS revenue
        |FROM spine s LEFT JOIN orders o
        |  ON date_trunc('month', o.o_orderdate) = s.m AND o.o_totalprice > 495000
        |GROUP BY s.m
        |ORDER BY s.m""".stripMargin
  )
}
