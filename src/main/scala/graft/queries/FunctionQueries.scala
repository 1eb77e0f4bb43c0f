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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "date_funcs" -> (dateFuncs _),
    "string_funcs2" -> (stringFuncs2 _),
    "map_explode" -> (mapExplode _)
  )

  val oracles: Map[String, String] = Map(
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
        |GROUP BY key ORDER BY key""".stripMargin
  )
}
