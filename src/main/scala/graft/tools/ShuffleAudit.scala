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

  /** WHOLE-WINDOW shuffle accounting via a [[org.apache.spark.scheduler.SparkListener]]:
    * sums every stage's shuffle-WRITE bytes/rows completed between
    * registration and the post-`collect` bus drain. This exists because
    * [[measure]]'s executed-plan walk is blind to work that runs BEFORE
    * the returned frame executes — families that eagerly
    * `localCheckpoint` during query CONSTRUCTION (the triangles
    * per-node materialization, label-propagation rounds, PageRank
    * cadence loops) do their heavy shuffles at build time, leaving the
    * final plan a cheap LogicalRDD scan (the committed r11 probe showed
    * `graph_triangles` at 3 KB of "shuffle" — just the output sort).
    * For a scale probe the construction-time shuffles ARE the cost
    * model, so [[ScaleProbe]] measures with this.
    *
    * Scope caveat: listener events are CONTEXT-global, so the window
    * attributes every concurrently-running job to this measurement —
    * callers must run measured queries serially on an otherwise idle
    * session (ScaleProbe does; Verify's thread pool must NOT use this).
    * Streaming micro-batch stages land in the same accounting, which is
    * exactly what the streamed-family probe wants. */
  def measureTotal(spark: org.apache.spark.sql.SparkSession)(
      build: => DataFrame): Volumes = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val rows = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null && m.shuffleWriteMetrics.bytesWritten > 0) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          rows.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          stages.incrementAndGet(): Unit
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = build.collect()
      org.apache.spark.GraftListenerFlush.waitUntilEmpty(spark.sparkContext)
      Volumes(bytes.get, rows.get, broadcastBytes = 0L,
        shuffleExchanges = stages.get, outputRows = out.length.toLong)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Per-STAGE shuffle-read concentration: max single-task read vs the
    * stage total, the signal that exposes KEY SKEW. Total shuffle volume
    * ([[measureTotal]]) is blind to it — a hot key moves zero extra
    * bytes, it just lands them all on ONE task, and at 100 TB that one
    * task IS the job's wall clock. [[SkewProbe]] measures join arms with
    * this and asserts the mitigation laws. */
  final case class StageSkew(stageId: Int, tasks: Int,
      maxTaskRows: Long, totalRows: Long,
      maxTaskBytes: Long, totalBytes: Long) {
    def rowShare: Double =
      if (totalRows <= 0) 0.0 else maxTaskRows.toDouble / totalRows
    def byteShare: Double =
      if (totalBytes <= 0) 0.0 else maxTaskBytes.toDouble / totalBytes
  }

  /** Runs the frame and records per-stage shuffle-READ task metrics.
    * Returns (stages sorted by read rows desc, collected output). Same
    * context-global listener caveat as [[measureTotal]]: callers run
    * serially on an idle session. */
  def measureTaskSkew(spark: org.apache.spark.sql.SparkSession)(
      build: => DataFrame): (Seq[StageSkew], Array[org.apache.spark.sql.Row]) = {
    val per = new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Long]]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        // SUCCESSFUL tasks only, keyed by (stage, attempt): failed/
        // speculative ends and stage retries would otherwise inflate the
        // per-stage totals and deflate the measured share — masking
        // exactly the concentration this exists to expose
        if (m != null && e.reason == org.apache.spark.Success) {
          val rows = m.shuffleReadMetrics.recordsRead
          val bytes = m.shuffleReadMetrics.totalBytesRead
          if (rows > 0 || bytes > 0) {
            per.compute((e.stageId, e.stageAttemptId), (_, old) => {
              val a = if (old == null) Array(0L, 0L, 0L, 0L, 0L) else old
              Array(math.max(a(0), rows), a(1) + rows,
                math.max(a(2), bytes), a(3) + bytes, a(4) + 1)
            }): Unit
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = build.collect()
      org.apache.spark.GraftListenerFlush.waitUntilEmpty(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      val stages = per.asScala.toSeq.map { case ((sid, _), a) =>
        StageSkew(sid, a(4).toInt, a(0), a(1), a(2), a(3))
      }.sortBy(-_.totalRows)
      (stages, out)
    } finally spark.sparkContext.removeSparkListener(listener)
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
