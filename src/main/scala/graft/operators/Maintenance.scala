package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

/** Table-maintenance operators. The reference pipeline's sink commits one
  * object per flush (`flush.size`, S8) — over time that leaves object
  * stores full of small files, and at 100 TB the file-listing and
  * per-file open costs dominate scans. Compaction is the standard fixup:
  * rewrite a directory into ~targetRowsPerFile-sized files.
  */
object Maintenance {

  /** Compact `inDir` (parquet or json) into `outDir` with roughly
    * `targetRowsPerFile` rows per output file. Shrinking the file count
    * — the compaction case — uses `coalesce` (narrow: no shuffle, tasks
    * just read multiple input files); growing it needs a real
    * `repartition` shuffle. Returns (rows, outputFiles). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      format: String, targetRowsPerFile: Long): (Long, Int) = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val df = spark.read.format(format).load(inDir)
    val n = df.count()
    val files = math.max(1L, math.ceil(n.toDouble / targetRowsPerFile).toLong).toInt
    val sized =
      if (files <= df.rdd.getNumPartitions) df.coalesce(files)
      else df.repartition(files)
    sized.write.mode("overwrite").format(format).save(outDir)
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val written = fs.listStatus(new Path(outDir))
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    (n, written)
  }
}
