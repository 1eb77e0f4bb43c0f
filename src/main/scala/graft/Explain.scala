package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print `explain("formatted")` for selected queries (all if no
  * args) so plans can be reviewed for pushdown, broadcast, and
  * whole-stage codegen coverage. Usage: runMain graft.Explain [sfDir] [q1 q2 ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.sources.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.explain("formatted")
        // raw executedPlan shows the `*(n)` whole-stage-codegen markers
        // that formatted mode hides
        println(df.queryExecution.executedPlan.toString
          .linesIterator.take(15).mkString("\n"))
      }
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
