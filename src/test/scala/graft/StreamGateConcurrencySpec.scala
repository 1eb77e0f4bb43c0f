package graft

import org.apache.spark.sql.functions._

/** Pins the gate harness's concurrency contract: [[graft.streaming.StreamGate
  * .runToCompletion]] is called from a thread POOL by the Verify main, so
  * its scoped session-conf overrides (state partitions, scratch checkpoint
  * root, no-data-batch toggle) must serialize their set→start→restore
  * window. Without that lock, stream B can capture stream A's checkpoint
  * root, and A's teardown deletes B's live state store files mid-run
  * (observed as FileNotFoundException on `right-keyWithIndexToValue` under
  * the 4-thread Verify pool). This spec drives more concurrent gate streams
  * than the pool the bug shipped under and asserts every one completes with
  * exactly its own results — and that the scratch roots are gone after. */
class StreamGateConcurrencySpec extends SparkSpec {

  test("concurrent gate streams never cross checkpoints and all complete") {
    val n = 6
    val src = java.nio.file.Files.createTempDirectory("gate_conc_src").toString
    spark.range(0, 1000).select(
      col("id"), (col("id") % 7).as("k"),
      // event-time column so each stream is STATEFUL (watermark + window
      // aggregation) — state stores are what the original race corrupted
      (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long") +
        col("id") * 60).cast("timestamp").as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema

    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks = (0 until n).map { i =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            val name = s"gate_conc_$i"
            val agg = spark.readStream.schema(schema).parquet(src)
              .withWatermark("ts", "1 minute")
              .groupBy(window(col("ts"), "1 hour"), col("k"))
              .agg(count(lit(1)).as("c"))
              .select(col("k"), col("c"))
            graft.streaming.StreamGate.runToCompletion(spark) {
              agg.writeStream.format("memory").queryName(name)
                .outputMode("append")
                .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
                .start()
            }
            // every hour-window closes under the far-past watermark except
            // the last, so each stream must see the same per-key totals
            val got = spark.table(name).groupBy(col("k")).agg(sum(col("c")))
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            assert(got.size == 7, s"stream $i: keys=${got.size}")
            assert(got.values.sum > 0, s"stream $i: empty result")
          } catch { case t: Throwable => failures.add(t) }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    assert(failures.isEmpty,
      s"concurrent gate streams failed: ${failures.peek()}")
    // no leak assertion on the shared scratch root: suites run in
    // parallel in this JVM, so another suite's gate stream may be
    // legitimately mid-run with its dir present
  }
}
