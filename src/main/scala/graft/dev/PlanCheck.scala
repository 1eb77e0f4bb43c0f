package graft.dev

/** Dev-only: print join/exchange lines of one registered query's plan.
  * Usage: runMain graft.dev.PlanCheck <query> <sfDir> */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.GraftSession.local(8)
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    println(df.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
