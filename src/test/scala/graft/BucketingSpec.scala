package graft

import org.apache.spark.sql.functions._

import graft.operators.Salting
import graft.sources.{Bucketing, Tables}

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle on the bucket key") {
    Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(Tables.lineitem(spark, sf), "b_lineitem", "l_orderkey", 8)

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
    val plan = withNoBroadcast {
      joined.queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() === Tables.lineitem(spark, sf).count())
  }

  private def withNoBroadcast[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned layout prunes partitions on a partition-column filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf).write.mode("overwrite")
      .partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "signup")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("signup"),
      s"no partition pruning in:\n$scan")
    assert(q.count() === Tables.events(spark, sf)
      .filter(col("event_type") === "signup").count())
  }

  test("dynamic partition pruning kicks in for a filtered dim join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .partitionBy("l_suppkey").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Tables.supplier(spark, sf).filter(col("s_nationkey") === 1)
    val joined = fact.join(dim, fact("l_suppkey") === dim("s_suppkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP in plan:\n${plan.take(2000)}")
    assert(joined.count() > 0 ||
      Tables.supplier(spark, sf).filter(col("s_nationkey") === 1).count() == 0)
  }

  test("salted join returns exactly the rows of the plain join") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_mktsegment"))
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name").as[(Long, String)].collect().toSet
    val salted = Salting.saltedJoin(orders, customer, "o_custkey", salts = 7)
      .select("o_orderkey", "c_name").as[(Long, String)].collect().toSet
    assert(salted === plain)
  }

  test("salted left join preserves unmatched rows exactly once") {
    val left = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "lv")
    val right = Seq((1L, "r1")).toDF("k", "rv")
    val out = Salting.saltedJoin(left, right, "k", salts = 5, joinType = "left_outer")
    assert(out.count() === 3)
    assert(out.filter(col("rv").isNull).count() === 2)
  }
}
