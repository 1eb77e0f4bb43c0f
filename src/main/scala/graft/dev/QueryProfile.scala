package graft.dev

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev probe (optimization rounds): per-query stage breakdown — where
  * the seconds actually go. For each named query it runs the noop-sink
  * materialization exactly like Bench, with a listener recording every
  * stage's wall time, executor run/CPU time, GC, task count, and
  * shuffle read/write bytes, then prints the stages sorted by executor
  * time. The second run per query separates codegen/JIT warmup from
  * steady-state cost (Bench's best-of-N takes the min, so the
  * steady-state number is the one that matters).
  *
  * Usage: runMain graft.dev.QueryProfile [sfDir] q1 [q2 ...]
  */
object QueryProfile {
  private case class StageRow(
      stageId: Int, name: String, tasks: Int,
      wallMs: Long, execRunMs: Long, cpuMs: Long, gcMs: Long,
      shufReadMB: Double, shufWriteMB: Double, inputMB: Double,
      maxTaskMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.sources.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    val stages = mutable.Map[Int, StageRow]()
    val taskAgg = mutable.Map[Int, (Long, Long, Long, Long)]() // run, cpu, gc, maxTask
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val m = t.taskMetrics
        if (m != null) {
          val (r, c, g, mx) = taskAgg.getOrElse(t.stageId, (0L, 0L, 0L, 0L))
          taskAgg(t.stageId) = (r + m.executorRunTime,
            c + m.executorCpuTime / 1000000, g + m.jvmGCTime,
            math.max(mx, m.executorRunTime))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
        val i = s.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        val (r, c, g, mx) = taskAgg.getOrElse(i.stageId, (0L, 0L, 0L, 0L))
        stages(i.stageId) = StageRow(i.stageId, i.name.takeWhile(_ != '\n').take(90),
          i.numTasks, wall, r, c, g,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6, mx)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      (1 to 2).foreach { round =>
        stages.clear(); taskAgg.clear()
        spark.sparkContext.setJobDescription(s"profile:$n#$round")
        val t0 = System.nanoTime()
        try {
          graft.SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val secs = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache(); System.gc()
          // listener events are posted async; let the queue drain
          Thread.sleep(300)
          println(f"%n===== $n run$round: $secs%.3f s, ${stages.size} stages =====")
          val rows = stages.values.toSeq.sortBy(-_.execRunMs)
          println(f"${"stage"}%5s ${"tasks"}%5s ${"wall"}%7s ${"exec"}%7s ${"cpu"}%7s " +
            f"${"gc"}%5s ${"maxTask"}%7s ${"shR MB"}%7s ${"shW MB"}%7s ${"in MB"}%7s  name")
          rows.take(14).foreach { r =>
            println(f"${r.stageId}%5d ${r.tasks}%5d ${r.wallMs}%7d ${r.execRunMs}%7d " +
              f"${r.cpuMs}%7d ${r.gcMs}%5d ${r.maxTaskMs}%7d ${r.shufReadMB}%7.2f " +
              f"${r.shufWriteMB}%7.2f ${r.inputMB}%7.2f  ${r.name}")
          }
          val sumExec = rows.map(_.execRunMs).sum
          val sumWall = rows.map(_.wallMs).sum
          println(f"[profile] $n run$round total=$secs%.3f s stageWallSum=${sumWall / 1000.0}%.2f s " +
            f"execSum=${sumExec / 1000.0}%.2f s stages=${rows.size} tasks=${rows.map(_.tasks).sum}")
        } catch { case e: Throwable =>
          println(s"[profile] $n FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
