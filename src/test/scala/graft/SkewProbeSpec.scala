package graft

import graft.tools.SkewProbe

/** The adversarial-skew laws, in CI form: [[graft.tools.SkewProbe]]
  * injects a hot key at a controlled share and measures per-TASK
  * shuffle-read concentration per mitigation arm. The inflation probes
  * (ScaleProbeSpec) bound total volume growth; this suite bounds volume
  * CONCENTRATION — the failure mode total accounting cannot see,
  * because a hot key moves no extra bytes, it just lands them all on
  * one task.
  *
  * Everything asserted here is deterministic: the hot assignment is
  * xxhash64(event_id), partitioning is murmur over a pinned partition
  * count, and the salt is a row-hash — the shares reproduce exactly
  * run-to-run, so the bounds are laws, not tolerances.
  */
class SkewProbeSpec extends SparkSpec {

  private def withParts[A](n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, saved)
  }

  test("hot-key probe: hazard manifests unmitigated; AQE split and advised salting both halve it; partial agg immune") {
    // 16 partitions, not the suite's 4: the skew geometry needs enough
    // reduce tasks that the background share (~(1-hot)/parts) does not
    // drown the hot key's share
    val p = withParts(16) {
      SkewProbe.run(spark, sf, k = 10, hotMicro = 300000L)
    }
    val byName = p.arms.map(a => a.name -> a).toMap
    val plain = byName("join_plain")
    val aqe = byName("join_aqe_skew")
    val salted = byName("join_salted")
    val agg = byName("agg_partial")

    // the injection itself: ~30% of rows on one key, and the advisor's
    // bounded-state sketches (CMS + freqItems) see it accurately
    assert(p.injectedShare > 0.25 && p.injectedShare < 0.36,
      s"injection drifted: ${p.injectedShare}")
    assert(math.abs(p.advice.maxShare - p.injectedShare) < 0.05,
      s"advise() mis-measured the hot share: ${p.advice.maxShare} vs ${p.injectedShare}")
    assert(p.advice.salts >= 3, s"advise() under-prescribed: ${p.advice.salts}")

    // POSITIVE CONTROL — the hazard must actually manifest, or the
    // mitigation assertions certify nothing
    assert(plain.worstShareRows >= 0.5 * p.injectedShare,
      s"plain join did not concentrate: ${plain.worstShareRows}")

    // AQE skew-join split: worst task at most half the unmitigated one
    assert(aqe.worstShareRows <= plain.worstShareRows / 2,
      s"AQE split did not engage: ${aqe.worstShareRows} vs plain ${plain.worstShareRows}")

    // advised salting: hot key spread across `salts` tasks (bound is
    // 0.6x, not the asymptotic hot/salts, because at 16 partitions two
    // salt buckets can land on the same reduce task)
    assert(salted.worstShareRows <= plain.worstShareRows * 0.6,
      s"salting did not spread the hot key: ${salted.worstShareRows} vs plain ${plain.worstShareRows}")

    // partial aggregation is skew-immune by plan shape: the map-side
    // combine collapses the hot key to one partial per map task
    assert(agg.worstShareRows <= 0.25,
      s"partial agg concentrated unexpectedly: ${agg.worstShareRows}")

    // mitigation must not change semantics: all three join arms
    // produced the identical aggregate
    val joinResults = p.arms.filter(_.name.startsWith("join")).map(_.result)
    assert(joinResults.distinct.size === 1, "join arms disagree on results")
    assert(joinResults.head.nonEmpty, "join arms produced no rows")

    // THE STREAMING MIRROR: the hot key hits micro-batch exchanges
    // exactly like batch ones — hazard, mitigation, and immunity all
    // reproduce, and the complete-mode results equal the batch arms'
    val sPlain = byName("stream_join_plain")
    val sSalted = byName("stream_join_salted")
    val sAgg = byName("stream_agg_hot")
    assert(sPlain.worstShareRows >= 0.5 * p.injectedShare,
      s"streamed join did not concentrate: ${sPlain.worstShareRows}")
    assert(sSalted.worstShareRows <= sPlain.worstShareRows * 0.6,
      s"salting did not carry over to the streaming plan: ${sSalted.worstShareRows}")
    assert(sAgg.worstShareRows <= 0.25,
      s"streamed stateful agg concentrated: ${sAgg.worstShareRows} — partial agg missing?")
    assert(sPlain.result === plain.result && sSalted.result === plain.result,
      "streamed join arms must equal the batch join result")
    assert(sAgg.result === agg.result,
      "streamed agg rollup must equal the batch agg result")

    // THE BOUNDARY of aggregation immunity: a payload-preserving agg
    // (collect_list) shrinks row counts map-side but not DATA — the
    // hazard reappears in the BYTE share while rows stay flat, and the
    // two-level capped salted aggregate spreads it, output-equal
    val pHot = byName("agg_payload_hot")
    val pSalted = byName("agg_payload_salted")
    assert(pHot.worstShareBytes >= 0.5 * p.injectedShare,
      s"payload agg did not concentrate bytes: ${pHot.worstShareBytes}")
    assert(pHot.worstShareRows <= 0.25,
      s"payload rows unexpectedly concentrated too: ${pHot.worstShareRows} — " +
        "the byte-vs-row contrast is the point of this arm")
    assert(pSalted.worstShareBytes <= pHot.worstShareBytes / 2,
      s"two-level salted agg did not spread the payload: ${pSalted.worstShareBytes}")
    assert(pHot.result === pSalted.result,
      "capped two-level agg must be output-equal to the direct agg")

    // THE WINDOW-FUNCTION FACE (VERDICT r13 task 6). Measured finding:
    // Spark 4.1's WindowGroupLimit prunes row_number<=k (and LWW's
    // rank<=1) MAP-SIDE, so the rank families are NATIVELY mitigated —
    // the receipts pin that, and pin where the hazard survives: a
    // frameless window aggregate has nothing to prune, its hot
    // partition sorts on one task, and the pre-agg + broadcast-join
    // rewrite is the output-equal escape
    val wHot = byName("window_rank_hot")
    val wSalted = byName("window_rank_salted")
    assert(wHot.worstShareRows <= 0.25,
      s"rank<=k window concentrated — WindowGroupLimit regressed? ${wHot.worstShareRows}")
    assert(wHot.result === wSalted.result,
      "salted two-level rank must be output-equal to the window form")
    val aHot = byName("window_agg_hot")
    val aRewrite = byName("window_agg_rewrite")
    assert(aHot.worstShareRows >= 0.5 * p.injectedShare,
      s"frameless window agg did not concentrate: ${aHot.worstShareRows}")
    assert(aRewrite.worstShareRows <= aHot.worstShareRows / 2,
      s"pre-agg rewrite did not spread: ${aRewrite.worstShareRows} vs ${aHot.worstShareRows}")
    assert(aHot.result === aRewrite.result,
      "pre-agg + broadcast join back must be output-equal to the window agg")
    val lHot = byName("lww_window_hot")
    val lMaxBy = byName("lww_max_by")
    assert(lHot.worstShareRows <= 0.25,
      s"LWW rank<=1 window concentrated — group-limit regressed? ${lHot.worstShareRows}")
    assert(lMaxBy.worstShareRows <= 0.25,
      s"max_by LWW concentrated: ${lMaxBy.worstShareRows} — partial agg missing?")
    assert(lHot.result === lMaxBy.result,
      "max_by LWW must be output-equal to the window row_number form")
  }

  test("topKPerKey: output-equal to the direct window form, at any salts/k geometry") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a hot key with many values, keys with fewer values than k, and a
    // 1-value key — the cap and the semilattice merge must be invisible
    val rows = (1L to 500L).map(v => (1L, v * 7 % 501)) ++ // hot key, shuffled values
      (1L to 30L).map(v => (2L, v)) ++ Seq((3L, 42L))
    val df = rows.toDF("key", "value")
    def direct(k: Int) = df
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key").orderBy("value"))
        .cast("long"))
      .filter(col("rank") <= k)
      .select("key", "rank", "value")
      .orderBy("key", "rank").collect().toSeq
    for (k <- Seq(1, 5, 100); salts <- Seq(1, 3, 8)) {
      val got = graft.operators.Salting.topKPerKey(df, "key", "value", k, salts)
        .orderBy("key", "rank").collect().toSeq
      assert(got === direct(k), s"topKPerKey diverged at k=$k salts=$salts")
    }
    // degenerate input: empty frame yields empty output, not an error
    assert(graft.operators.Salting.topKPerKey(
      df.limit(0), "key", "value", 5, 4).count() === 0L)
    // null values are excluded by contract (engine-neutral: window
    // ranking would order nulls differently per engine)
    val withNulls = df.unionByName(Seq((2L, Option.empty[Long]), (4L, Option.empty[Long]))
      .toDF("key", "value"))
    val nulled = graft.operators.Salting.topKPerKey(withNulls, "key", "value", 5, 3)
      .orderBy("key", "rank").collect().toSeq
    assert(nulled === graft.operators.Salting.topKPerKey(df, "key", "value", 5, 3)
      .orderBy("key", "rank").collect().toSeq,
      "null values must not rank, and an all-null key must not appear")
    // DUPLICATE-HEAVY values (r13 review): a value-hash salt would send
    // every copy of a value to one bucket, re-concentrating the hot key
    // this operator exists to spread; the row-hash salt must both
    // spread them and keep the multiset output exact (duplicates rank
    // with multiplicity, like the window form)
    val dupRows = ((1L to 300L).map(i => (7L, 5L, i)) ++ // 300 copies of value 5
      (1L to 10L).map(i => (7L, i, 1000L + i))).toDF("key", "value", "tag")
    val dupGot = graft.operators.Salting.topKPerKey(dupRows, "key", "value", 8, 4)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // 8 smallest with multiplicity: 1,2,3,4, then four of the 5s
    assert(dupGot === Seq(1L, 2L, 3L, 4L, 5L, 5L, 5L, 5L).zipWithIndex
      .map { case (v, i) => (i + 1L, v) }, s"duplicate multiset broke: $dupGot")
    // output-name collisions fail loudly at the door, not with a
    // downstream AMBIGUOUS_REFERENCE
    intercept[IllegalArgumentException] {
      graft.operators.Salting.topKPerKey(
        df.withColumnRenamed("key", "rank"), "rank", "value", 5, 2)
    }
  }

  test("adaptiveTopKPerKey: advise picks the salts; both branches output-equal the window form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def direct(df: org.apache.spark.sql.DataFrame, k: Int) = df
      .filter(col("value").isNotNull)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key").orderBy("value"))
        .cast("long"))
      .filter(col("rank") <= k)
      .select("key", "rank", "value")
      .orderBy("key", "rank").collect().toSeq
    // skewed: one key holds 90% of rows -> advise prescribes salts > 1
    val hot = ((1L to 900L).map(v => (1L, v)) ++
      (1L to 100L).map(v => (2L, v))).toDF("key", "value")
    val adviceHot = graft.operators.Salting.advise(hot, "key", 32)
    assert(adviceHot.salts > 1, s"fixture not skewed enough: $adviceHot")
    assert(graft.operators.Salting.adaptiveTopKPerKey(hot, "key", "value", 7, 32)
      .orderBy("key", "rank").collect().toSeq === direct(hot, 7))
    // flat: 100 keys x 10 rows -> advise says 1, the direct branch runs
    val flat = (1L to 1000L).map(v => (v % 100, v)).toDF("key", "value")
    val adviceFlat = graft.operators.Salting.advise(flat, "key", 32)
    assert(adviceFlat.salts === 1, s"flat fixture advised salting: $adviceFlat")
    assert(graft.operators.Salting.adaptiveTopKPerKey(flat, "key", "value", 3, 32)
      .orderBy("key", "rank").collect().toSeq === direct(flat, 3))
    // the direct form exposed by the adaptive path obeys the same contract
    assert(graft.operators.Salting.directTopKPerKey(hot, "key", "value", 7)
      .orderBy("key", "rank").collect().toSeq === direct(hot, 7))
    intercept[IllegalArgumentException] {
      graft.operators.Salting.directTopKPerKey(hot, "key", "key", 3)
    }
  }

  test("committed skew artifact parses and every law holds") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val f = new java.io.File("SCALE_r14_skew.json")
    assert(f.isFile, "committed artifact SCALE_r14_skew.json missing from repo root")
    val root = om.readTree(f)
    val laws = root.get("laws")
    for (law <- Seq("hazard_manifest", "aqe_mitigates", "salting_mitigates",
        "agg_immune", "arms_row_equal", "stream_hazard_manifest",
        "stream_salting_mitigates", "stream_agg_immune", "stream_batch_equal",
        "payload_hazard_manifest", "payload_salting_mitigates",
        "payload_arms_equal", "window_grouplimit_prunes",
        "window_rank_arms_equal", "window_hazard_manifest",
        "window_rewrite_mitigates", "window_agg_arms_equal",
        "lww_grouplimit_prunes", "lww_max_by_immune", "lww_arms_equal")) {
      assert(laws.get(law).asBoolean(), s"committed skew artifact: $law false")
    }
    assert(root.get("arms").size() === 15, "committed skew artifact: arm missing")
    assert(root.get("injected_share").asDouble() > 0.2,
      "committed skew artifact: injection too weak to certify anything")
  }
}
