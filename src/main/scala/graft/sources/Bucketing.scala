package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table support: pre-shuffle fact tables once at write time so
  * every subsequent equi-join/aggregation on the bucket key is
  * shuffle-free (SortMergeJoin directly over bucketed scans).
  *
  * At 100 TB this is the difference between re-shuffling the fact table
  * per query and paying the shuffle once at ingest: `orders` and
  * `lineitem` bucketed by order key co-locate, so order-level joins read
  * co-bucketed files with no Exchange in the plan (asserted in
  * BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (bucketBy requires the
    * table catalog; plain path writes can't carry bucket metadata). */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // the orphaned-location cleanup below derives the managed location
    // as <warehouse>/<table> — correct only for unqualified names in
    // the default database (db.table lives at <warehouse>/<db>.db/…),
    // so reject qualified names rather than silently cleaning the
    // wrong path
    require(!table.contains("."),
      s"writeBucketed requires an unqualified table name, got '$table'")
    // the in-memory catalog forgets tables across JVMs while the
    // warehouse directory survives — Overwrite then can't drop the
    // unknown table and CREATE trips over the orphaned location, so
    // clear both explicitly before writing
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy((if (sortCols.isEmpty) Seq(key) else sortCols).head,
        (if (sortCols.isEmpty) Seq(key) else sortCols).tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
