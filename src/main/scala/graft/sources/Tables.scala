package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders over the driver-generated testdata layout
  * (`/root/repo/TESTDATA.md`): one parquet file per table under `dir`.
  *
  * This is the batch analog of the reference's two scans — the Kafka
  * consumer scan (`/root/reference/producer/verifier_ui.py:36-76`) and the
  * MinIO object scan (`verifier_ui.py:88-96`) — re-expressed as columnar
  * parquet reads so Catalyst gets pushdown/pruning for free. At cluster
  * scale the same call sites take `s3a://bucket/...` paths; nothing here
  * assumes a local filesystem.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** Session conf every graft session must set at BUILD time: `events.ts`
    * is parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    * ([PARQUET_TYPE_ILLEGAL]); this legacy flag reads the nanos as a
    * plain long instead. It is session-global (no per-read parquet option
    * exists for it — ParquetOptions only exposes mergeSchema/compression/
    * rebase), so it lives in the session builders (Bench/Verify/Explain/
    * SparkSpec), not as a hidden mutation inside a table loader. */
  val nanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** Truncates ns→us via integer `div` — DuckDB also truncates when
    * narrowing, so both engines see identical instants. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.getOption(nanosAsLongKey).contains("true"),
      s"$nanosAsLongKey must be set to true at session build time " +
        "(events.parquet stores TIMESTAMP(NANOS))")
    load(spark, dir, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  /** Explicit schema for STREAMING reads of events.parquet (streaming
    * sources can't infer): `ts` arrives as the raw TIMESTAMP(NANOS)
    * int64 under the session's nanosAsLong flag. One definition for
    * every streamed-events query — a column change updated in one
    * inline copy but not another would silently read stale columns as
    * null under the explicit-schema path. */
  val eventsStreamSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
