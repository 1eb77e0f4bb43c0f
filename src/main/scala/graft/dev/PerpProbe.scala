package graft.dev

import org.apache.spark.sql.functions._

/** Throwaway dev probe: stage timings for text_perplexity_buckets. */
object PerpProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[perp] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    val tri = docs.select(col("doc_id"),
      explode(when(length(col("text")) >= 3,
        expr("transform(sequence(1, length(text)-2), i -> substring(text, i, 3))"))
        .otherwise(array().cast("array<string>"))).as("tri"))
    time("explode+count")(println(tri.count()))
    time("explode+count again")(println(tri.count()))
    time("cnt3")(println(tri.groupBy(col("tri")).agg(count(lit(1))).count()))
    time("docAgg")(println(tri.groupBy(col("doc_id")).agg(count(lit(1))).count()))
    time("full query sf0.1")(
      graft.queries.TextQueries.perplexityBuckets(spark, dir)
        .write.format("noop").mode("overwrite").save())
    time("full query again")(
      graft.queries.TextQueries.perplexityBuckets(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
