package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Post-execution shuffle/broadcast VOLUME accounting from the executed
  * plan's own SQL metrics — the quantitative companion to the
  * plan-SHAPE audit (`graft.PlanAudit` counts operators; this weighs
  * them). Execute the frame, then walk the adaptive plan graph
  * (AdaptiveSparkPlanExec → materialized query stages → children) and
  * sum every exchange's written bytes/rows.
  *
  * Why it exists: two plans with identical operator counts can differ
  * 10× in exchanged bytes (a dropped pre-shuffle projection, a filter
  * that slid above its exchange, a widened aggregation key). At 100 TB
  * exchanged bytes ARE the cost model — so ShuffleBudgetSpec pins
  * per-query byte budgets measured at sf0.001 and fails any change
  * that grows them past headroom, catching regressions plan-shape
  * counting is blind to.
  */
object ShuffleAudit {

  final case class Volumes(shuffleBytes: Long, shuffleRows: Long,
      broadcastBytes: Long, shuffleExchanges: Int, outputRows: Long = 0L)

  /** Every node of an executed plan, crossing AQE stage boundaries —
    * public so plan-audit specs can ask structural questions (e.g.
    * "which exchanges sit above the union?") without re-deriving the
    * adaptive-plan walk. */
  def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  private def metric(p: SparkPlan, names: Seq[String]): Long =
    names.flatMap(n => p.metrics.get(n)).map(_.value).headOption.getOrElse(0L)

  /** Run the frame to completion and account its exchanges. */
  def measure(df: DataFrame): Volumes = {
    val out = df.collect() // populate metrics
    val nodes = flatten(df.queryExecution.executedPlan)
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    val broadcasts = nodes.collect { case b: BroadcastExchangeLike => b }
    Volumes(
      shuffleBytes = shuffles.map(metric(_, Seq("shuffleBytesWritten", "bytesWritten"))).sum,
      shuffleRows = shuffles.map(metric(_, Seq("shuffleRecordsWritten", "recordsWritten"))).sum,
      broadcastBytes = broadcasts.map(metric(_, Seq("dataSize"))).sum,
      shuffleExchanges = shuffles.size,
      outputRows = out.length.toLong)
  }

  /** Dev probe: `runMain graft.tools.ShuffleAudit [sfDir] [q1 q2 ...]` —
    * one volumes line per query, the discovery pass behind
    * ShuffleBudgetSpec's budgets. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.sources.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val v = measure(graft.SparkEntry.queries(n)(spark, sfDir))
        println(s"[shuffle] $n bytes=${v.shuffleBytes} rows=${v.shuffleRows} " +
          s"bcast=${v.broadcastBytes} exchanges=${v.shuffleExchanges}")
      } catch { case e: Throwable =>
        println(s"[shuffle] $n FAILED: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(120))
      }
    }
    spark.stop()
  }
}
