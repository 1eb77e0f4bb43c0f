package graft

/** Dev probe: one summary line of plan features per registered query —
  * the discovery pass behind PlanShapeSpec. Usage:
  * runMain graft.PlanAudit [sfDir] [q1 q2 ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.sources.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        val formatted = org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted")
        val fstr = df.queryExecution.explainString(formatted)
        def count(s: String) = plan.sliding(s.length).count(_ == s)
        val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
          .findAllMatchIn(fstr).map(_.group(1).trim).toSeq
        println(s"[audit] $n cartesian=${count("CartesianProduct")} " +
          s"smj=${count("SortMergeJoin")} bhj=${count("BroadcastHashJoin")} " +
          s"shj=${count("ShuffledHashJoin")} bnlj=${count("BroadcastNestedLoopJoin")} " +
          s"wsc=${"""\[codegen id : (\d+)\]""".r.findAllMatchIn(fstr).map(_.group(1)).toSet.size} " +
          s"scans=${pushed.size} pushedNonEmpty=${pushed.count(_.nonEmpty)}")
      } catch { case e: Throwable =>
        println(s"[audit] $n FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    spark.stop()
  }
}
