package graft

import org.apache.spark.sql.functions._

import graft.queries.BenchOnly

/** The `sketch_only` bench variants are NOT oracle-gated (that is
  * their reason to exist — no exact bracket riding along), so this
  * spec keeps them from rotting: each `_fast` variant must agree with
  * its registered bracket counterpart on shape and on the estimates
  * the bracket pins.
  */
class BenchOnlySpec extends SparkSpec {

  test("approx_distinct_fast matches the bracket query's groups and error bound") {
    val fast = BenchOnly.approxDistinctFast(spark, sf).collect()
    val bracket = SparkEntry.queries("approx_distinct")(spark, sf).collect()
    assert(fast.length === bracket.length)
    val exact = bracket.map(r =>
      r.getAs[String]("l_returnflag") -> r.getAs[Long]("exact_parts")).toMap
    fast.foreach { r =>
      val e = exact(r.getAs[String]("l_returnflag"))
      val a = r.getAs[Long]("approx_parts")
      assert(math.abs(a - e).toDouble / e <= 0.1,
        s"sketch-only estimate $a vs exact $e out of the bracket bound")
    }
  }

  test("agg_approx_percentiles_fast emits the same groups, estimates inside the bracket bound") {
    val fast = BenchOnly.approxPercentilesFast(spark, sf).collect()
    val bracket = SparkEntry.queries("agg_approx_percentiles")(spark, sf).collect()
    assert(fast.map(_.getString(0)).toSeq === bracket.map(_.getString(0)).toSeq)
    val exact = bracket.map(r => r.getAs[String]("event_type") ->
      (r.getAs[Double]("p50_exact"), r.getAs[Double]("p90_exact"))).toMap
    fast.foreach { r =>
      val (e50, e90) = exact(r.getAs[String]("event_type"))
      def ok(a: Double, e: Double) = math.abs(a - e) <= math.max(math.abs(e) * 0.05, 1e-6)
      assert(ok(r.getAs[Double]("p50_approx"), e50) && ok(r.getAs[Double]("p90_approx"), e90))
    }
  }

  test("agg_sketch_merge_fast estimate equals the bracket query's merged sketch") {
    val fast = BenchOnly.sketchMergeFast(spark, sf).collect()
    val bracket = SparkEntry.queries("agg_sketch_merge")(spark, sf).collect()
    assert(fast.length === bracket.length)
    val exact = bracket.map(r =>
      r.getAs[String]("l_returnflag") -> r.getAs[Long]("exact_parts")).toMap
    fast.foreach { r =>
      val e = exact(r.getAs[String]("l_returnflag"))
      assert(math.abs(r.getAs[Long]("approx_parts") - e).toDouble / e <= 0.1)
    }
  }

  test("freq_items_fast nominates every exact heavy hitter (coverage law)") {
    val nominated = BenchOnly.freqItemsFast(spark, sf).collect()
      .map(_.getString(0)).toSet
    val heavy = SparkEntry.queries("freq_items")(spark, sf).collect()
      .map(_.getAs[String]("event_type")).toSet
    assert(heavy.subsetOf(nominated),
      s"sketch must cover all heavy hitters: missing ${heavy -- nominated}")
  }

  test("every sketchOnly key shadows a registered bracket query") {
    // naming contract the bench artifact relies on: <name>_fast ↔ <name>
    BenchOnly.sketchOnly.keys.foreach { k =>
      assert(k.endsWith("_fast"))
      assert(SparkEntry.queries.contains(k.stripSuffix("_fast")),
        s"$k shadows no registered query")
    }
    BenchOnly.bracketed.foreach(b =>
      assert(SparkEntry.queries.contains(b), s"bracketed tag $b not registered"))
  }
}
