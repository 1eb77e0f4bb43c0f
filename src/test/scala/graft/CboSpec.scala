package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Cost-based-optimizer receipts — the one optimizer mechanism AQE does
  * not replace: AQE re-plans from RUNTIME shuffle sizes, but the initial
  * plan (join order, pre-shuffle broadcast choices) is costed from
  * CATALOG statistics, which `ANALYZE TABLE` must populate. At 100 TB
  * a mis-ordered multi-join is unrecoverable mid-flight, so the stats →
  * cardinality-estimate path is part of the engine contract:
  * the catalog carries rowCount after ANALYZE, column stats sharpen
  * filter selectivity estimates, and turning CBO on never changes
  * results.
  */
class CboSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ANALYZE TABLE populates catalog row counts and column stats") {
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    Tables.orders(spark, sf).write.mode("overwrite").saveAsTable("cbo_orders")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_totalprice, o_custkey")
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("cbo_orders"))
    val stats = meta.stats.getOrElse(fail("ANALYZE left no table stats"))
    val actual = spark.table("cbo_orders").count()
    assert(stats.rowCount.contains(BigInt(actual)),
      s"catalog rowCount ${stats.rowCount} != actual $actual")
    assert(stats.colStats.contains("o_totalprice") &&
      stats.colStats("o_totalprice").min.isDefined,
      s"column stats missing: ${stats.colStats.keySet}")
  }

  test("CBO cardinality estimates track reality through a filter, and results are invariant") {
    spark.sql("DROP TABLE IF EXISTS cbo_orders2")
    Tables.orders(spark, sf).write.mode("overwrite").saveAsTable("cbo_orders2")
    spark.sql("ANALYZE TABLE cbo_orders2 COMPUTE STATISTICS FOR COLUMNS o_totalprice")
    withConf("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      val q = spark.table("cbo_orders2").filter(col("o_totalprice") > 200000.0)
      val est = q.queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("CBO produced no rowCount estimate"))
      val actual = q.count()
      // histogram-free column stats assume uniformity; the generator's
      // o_totalprice is near-uniform, so the estimate must land within
      // 2x — the property that makes join-order costing trustworthy
      assert(est.toLong <= actual * 2 && est.toLong >= actual / 2,
        s"selectivity estimate $est vs actual $actual drifted past 2x")
      // and CBO must be a pure strategy change: same rows either way
      val withCbo = q.agg(count(lit(1)), sum(col("o_totalprice")
        .cast("decimal(18,2)"))).collect()(0)
      val noCbo = withConf("spark.sql.cbo.enabled" -> "false") {
        spark.table("cbo_orders2").filter(col("o_totalprice") > 200000.0)
          .agg(count(lit(1)), sum(col("o_totalprice")
            .cast("decimal(18,2)"))).collect()(0)
      }
      assert(withCbo === noCbo, "CBO changed query RESULTS")
    }
  }
}
