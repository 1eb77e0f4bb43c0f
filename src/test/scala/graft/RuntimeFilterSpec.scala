package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Runtime row-level join pruning: with a selective dim-side filter,
  * Catalyst injects a bloom filter on the fact side (the shuffle-join
  * analog of dynamic partition pruning — fact rows that cannot match are
  * dropped at the scan, before the shuffle).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim filter injects a bloom filter on the fact scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, sf)
      val dim = Tables.supplier(spark, sf).filter(col("s_nationkey") === 3)
      val joined = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n${plan.take(3000)}")
      // correctness unchanged by the filter
      val expected = fact.join(
        Tables.supplier(spark, sf).filter(col("s_nationkey") === 3)
          .hint("broadcast"), col("l_suppkey") === col("s_suppkey")).count()
      assert(joined.count() === expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
