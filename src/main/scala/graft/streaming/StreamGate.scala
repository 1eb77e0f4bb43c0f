package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Runs a bounded (AvailableNow) stream with the state-store partition
  * count sized to the STATE, not to the session's batch shuffle
  * default.
  *
  * A stateful streaming query creates one state-store instance per
  * shuffle partition, fixed at the query's first batch, and every
  * micro-batch pays a per-instance lifecycle cost (provider init,
  * snapshot, commit files — RocksDB instances are the extreme case)
  * that is INDEPENDENT of how many rows the instance holds. At the
  * oracle-gate replay scale that fixed cost dominates: 32 instances ×
  * (data batch + no-data watermark batches) of file churn was most of
  * the 3.8–4.6 s the heavier `_streamed` queries cost in the round-9
  * bench (VERDICT r9 ask #5). The default here keeps a handful of
  * instances — still exercising cross-partition state movement — and a
  * production deployment whose state actually fills executors raises
  * `spark.graft.streamStatePartitions` to match its state volume (the
  * same sizing call as `spark.sql.shuffle.partitions` itself; Spark
  * cannot re-partition existing state, so pick it for the lifetime of
  * the checkpoint).
  *
  * Correctness is unaffected: partition count changes where keys live,
  * never what the aggregation emits (stream==batch equality over every
  * `_streamed` query is the standing oracle gate).
  */
object StreamGate {

  /** Session conf key for the per-query state partition count. */
  val statePartitionsKey = "spark.graft.streamStatePartitions"

  private val shuffleKey = "spark.sql.shuffle.partitions"

  /** Start a stream with state-sized shuffle partitions and wait for it
    * to finish. The override is scoped to the `start` call — the
    * partition count is captured into the query plan at start, so the
    * session's batch default is restored before anything else plans. */
  def runToCompletion(spark: SparkSession)(start: => StreamingQuery): Unit = {
    val n = spark.conf.getOption(statePartitionsKey).getOrElse("8")
    val prior = spark.conf.getOption(shuffleKey)
    spark.conf.set(shuffleKey, n)
    val q =
      try start
      finally prior match {
        case Some(v) => spark.conf.set(shuffleKey, v)
        case None    => spark.conf.unset(shuffleKey)
      }
    q.awaitTermination()
    // env-gated receipt for harness-cost investigations: batch count ×
    // per-batch duration is the fixed-overhead profile of a gate run
    if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
      q.recentProgress.foreach { p =>
        System.err.println(s"[stream-debug] ${q.name} batch=${p.batchId} " +
          s"rows=${p.numInputRows} ms=${p.batchDuration} " +
          s"addBatch=${Option(p.durationMs.get("addBatch")).getOrElse(-1L)} " +
          s"getBatch=${Option(p.durationMs.get("getBatch")).getOrElse(-1L)} " +
          s"walCommit=${Option(p.durationMs.get("walCommit")).getOrElse(-1L)} " +
          s"stateRows=${p.stateOperators.map(_.numRowsTotal).mkString(",")} " +
          s"commitMs=${p.stateOperators.map(_.commitTimeMs).mkString(",")}")
      }
  }
}
