package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `Dataset.observe` — inline metrics that ride the existing action
  * instead of a second scan: batch metrics vs a direct aggregate, and
  * the streaming variant surfacing per-batch metrics through
  * `StreamingQueryProgress.observedMetrics`. */
class ObserveSpec extends SparkSpec {
  import spark.implicits._

  private implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("batch observe metrics equal the direct aggregate") {
    val observed = graft.queries.MaintenanceQueries
      .pipelineObserveMetrics(spark, sf).collect()(0)
    val direct = graft.sources.Tables.lineitem(spark, sf)
      .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(18,2)")).cast("double"),
        count(when(col("l_returnflag") === "R", 1))).collect()(0)
    assert(observed.getLong(0) === direct.getLong(0))
    assert(observed.getDouble(1) === direct.getDouble(1))
    assert(observed.getLong(2) === direct.getLong(2))
  }

  test("streaming observe metrics surface in StreamingQueryProgress") {
    val stream = MemoryStream[Long]
    val df = stream.toDS().toDF("v")
      .observe("dq", count(lit(1)).as("n"), sum(col("v")).as("total"))
    val q = df.writeStream.format("memory").queryName("observe_stream_spec")
      .outputMode("append").start()
    try {
      stream.addData(1L, 2L, 3L)
      q.processAllAvailable()
      stream.addData(10L)
      q.processAllAvailable()
      // per-batch metrics accumulate across progress entries: the sums
      // over all batches must equal the totals over everything added
      val dq = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("dq")))
      val n = dq.map(_.getAs[Long]("n")).sum
      val total = dq.map(_.getAs[Long]("total")).sum
      assert(n === 4L, s"observed row count wrong: $n")
      assert(total === 16L, s"observed sum wrong: $total")
    } finally q.stop()
  }
}
