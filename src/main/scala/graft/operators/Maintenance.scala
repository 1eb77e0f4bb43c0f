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
    * `repartition` shuffle. Returns (rows, outputFiles).
    *
    * Cost note: row-sizing needs the count BEFORE the write can be
    * partitioned, so this reads the data twice (plus a schema-inference
    * pass for json). At compaction scale prefer [[compactBytes]], which
    * sizes from listing METADATA — one data scan total. */
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

  /** The at-scale compaction form: output file count sized from the
    * INPUT LISTING's summed byte lengths (`ceil(bytes / targetBytes)`) —
    * pure metadata, so the data is read exactly once, by the write
    * itself (r14: the row-sized [[compact]] pays a full extra scan for
    * its count, and a third inference pass for json). Compression-ratio
    * drift between input and output shifts file sizes, not correctness;
    * the row-sized form remains for callers that need row-exact files.
    * Returns (inputBytes, outputFiles). */
  def compactBytes(spark: SparkSession, inDir: String, outDir: String,
      format: String, targetBytesPerFile: Long): (Long, Int) = {
    require(targetBytesPerFile > 0, "targetBytesPerFile must be positive")
    val inPath = new Path(inDir)
    val inFs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = inFs.listFiles(inPath, true)
    var bytes = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !st.getPath.getName.startsWith("_")) bytes += st.getLen
    }
    val files = math.max(1L,
      math.ceil(bytes.toDouble / targetBytesPerFile).toLong).toInt
    val df = spark.read.format(format).load(inDir)
    val sized =
      if (files <= df.rdd.getNumPartitions) df.coalesce(files)
      else df.repartition(files)
    sized.write.mode("overwrite").format(format).save(outDir)
    val outFs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val written = outFs.listStatus(new Path(outDir))
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    (bytes, written)
  }
}
