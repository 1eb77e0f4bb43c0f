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
      sortCols: Seq[String] = Nil): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy((if (sortCols.isEmpty) Seq(key) else sortCols).head,
        (if (sortCols.isEmpty) Seq(key) else sortCols).tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
