package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev main: time variants of a query to bisect overhead. */
object DevTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[devtime] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val cust = graft.sources.Tables.customer(spark, dir)
    time("warmup count")(cust.count())
    time("scan only") {
      cust.write.format("noop").mode("overwrite").save()
    }
    time("select no order") {
      cust.select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).as("name_len"),
        regexp_replace(col("c_name"), "Customer", "C").as("short_name"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"))
        .write.format("noop").mode("overwrite").save()
    }
    time("select + orderBy") {
      graft.queries.CoverageQueries.stringFuncs(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("no regexp + orderBy") {
      cust.select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).as("name_len"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"))
        .orderBy(col("c_custkey"))
        .write.format("noop").mode("overwrite").save()
    }
    time("regexp only + orderBy") {
      cust.select(col("c_custkey"),
        regexp_replace(col("c_name"), "Customer", "C").as("short_name"))
        .orderBy(col("c_custkey"))
        .write.format("noop").mode("overwrite").save()
    }
    time("select + orderBy again") {
      graft.queries.CoverageQueries.stringFuncs(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
