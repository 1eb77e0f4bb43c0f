package graft.dev

import org.apache.spark.sql.functions._

/** Dev-only: decompose the pinned-query BM25 probe's cost at several
  * inflation factors — per-stage row counts to localize any
  * superlinear growth the scale probe flags. */
object FixedQProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.sources.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- Seq(1, 10, 30)) {
      val dir = graft.tools.ScaleProbe.inflateTo(spark, sf, k)
      try {
        val queries = graft.sources.Tables.documents(spark, dir)
          .filter(col("doc_id") % 37 === 0 &&
            col("doc_id") < graft.tools.Inflate.keyOffset)
          .select(col("doc_id").as("query_id"),
            explode(array_distinct(
              graft.functions.TextFunctions.tokens(col("text")))).as("t"))
        val postings = graft.queries.RetrievalQueries.postingsIndex(spark, dir)
        val nq = queries.count()
        val np = postings.count()
        val joinRows = queries.join(postings.filter(col("doc_id") % 37 =!= 0), Seq("t")).count()
        val pairs = queries.join(postings.filter(col("doc_id") % 37 =!= 0), Seq("t"))
          .select("query_id", "doc_id").distinct().count()
        println(f"[fixedq] k=$k%-3d queryTermRows=$nq%8d postings=$np%10d " +
          f"joinRows=$joinRows%12d distinctPairs=$pairs%10d")
        // shuffle accounting of the full probe at fixed vs scaled
        // partition counts — per-task partial-agg volume is the knob
        for (layout <- Seq("asis", "byterm", "bydoc")) {
          val p0 = postings.filter(col("doc_id") % 37 =!= 0)
          val p = layout match {
            case "byterm" => p0.repartition(col("t"))
            case "bydoc" => p0.repartition(col("doc_id"))
            case _ => p0
          }
          val v = graft.tools.ShuffleAudit.measureTotal(spark)(
            graft.queries.RetrievalQueries.bm25ProbeDenorm(queries, p, 10))
          println(f"[fixedq]   layout=$layout%7s shuffleBytes=${v.shuffleBytes}%10d " +
            f"shuffleRows=${v.shuffleRows}%10d")
        }
      } finally graft.tools.ScaleProbe.cleanup(dir)
    }
    spark.stop()
  }
}
