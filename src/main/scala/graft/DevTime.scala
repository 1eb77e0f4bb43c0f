package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev main: time stages of a query to bisect overhead. */
object DevTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.sources.GraftSession.local(32)

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[devtime] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    import graft.functions.TextFunctions
    val docs = graft.sources.Tables.documents(spark, dir)
    time("warmup")(docs.count())
    val fused = docs.select(col("doc_id"),
      TextFunctions.shingles(col("text"), 3).as("sh"),
      graft.operators.Dedup.simhash64(TextFunctions.tokens(col("text"))).as("sig"))
    fused.collect()
    println("[devtime] fused-expression plan after execution:")
    println(fused.queryExecution.executedPlan.toString.linesIterator.take(8).mkString("\n"))
    val withSh = docs.select(col("doc_id"),
      TextFunctions.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles only") {
      withSh.write.format("noop").mode("overwrite").save()
    }
    time("md5 16-perm signatures") {
      withSh.withColumn("sig",
        graft.operators.Dedup.minhashSignatureMd5(col("sh"), 16))
        .select("doc_id", "sig")
        .write.format("noop").mode("overwrite").save()
    }
    time("full minhashNearDups") {
      graft.operators.Dedup.minhashNearDups(docs, "doc_id", "text",
        k = 3, numHashes = 16, bands = 4, threshold = 0.8, useMd5 = true)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    time("full minhashNearDups fast (xxhash)") {
      graft.operators.Dedup.minhashNearDups(docs, "doc_id", "text",
        k = 3, numHashes = 16, bands = 4, threshold = 0.8, useMd5 = false)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
