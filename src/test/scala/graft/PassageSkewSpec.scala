package graft

import graft.tools.PassageSkewProbe

/** The passage-family hot-tile laws, in CI form (VERDICT r18 ask #1):
  * [[graft.tools.PassageSkewProbe]] injects a boilerplate tile into the
  * real documents corpus — the C4 paper's motivating hazard at 100 TB —
  * and measures per-task shuffle-read concentration across the window
  * form (r18, removed), the bare join-back (split disabled), the same
  * under AQE skew-join, and the shipped heavy-hitter broadcast split.
  *
  * The deliberately uncomfortable laws here are the NEGATIVE ones: AQE
  * rescues neither the window (unsplittable by construction) nor the
  * agg-fed join-back (pattern never matches, and compressed map stats
  * cannot see a byte-identical hot tile). They are why `hotTileOcc` is
  * on by default in the operators, and they must keep holding — if a
  * Spark upgrade ever makes AQE split these shapes, these assertions
  * fail and the default deserves re-evaluation.
  */
class PassageSkewSpec extends SparkSpec {

  private def withParts[A](n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, saved)
  }

  test("hot-tile probe: window and join-back concentrate (AQE blind to both); " +
      "the shipped hotTileOcc broadcast split mitigates without AQE; all arms row-equal") {
    // 16 partitions for the same reason as SkewProbeSpec: the skew
    // geometry needs enough reduce tasks that the background share
    // (~1/parts) does not drown the hot tile's share
    val p = withParts(16) {
      PassageSkewProbe.run(spark, sf, k = 10, hotMicro = 500000L)
    }
    val byName = p.arms.map(a => a.name -> a).toMap
    val win = byName("passage_window_hot")
    val plain = byName("passage_join_plain")
    val aqe = byName("passage_join_aqe")
    val split = byName("passage_hotsplit")

    // the injection: ~20% of tile rows on one passage key (6 repeats
    // on half the docs of an ~11-tile/doc salted corpus), deterministic
    assert(p.injectedShare > 0.15 && p.injectedShare < 0.30,
      s"injection drifted: ${p.injectedShare}")

    // POSITIVE CONTROLS — the hazard must actually manifest
    assert(win.worstShareRows >= 0.5 * p.injectedShare,
      s"window form did not concentrate: ${win.worstShareRows}")
    assert(plain.worstShareRows >= 0.5 * p.injectedShare,
      s"split-disabled join-back did not concentrate: ${plain.worstShareRows}")

    // NEGATIVE receipt — AQE skew-join does not engage on the agg-fed
    // join-back (structurally unmatched + compression-blinded), so the
    // broadcast split cannot be delegated to runtime mitigation
    assert(aqe.worstShareRows >= 0.5 * p.injectedShare,
      s"AQE unexpectedly split the join-back (${aqe.worstShareRows}) — " +
        "re-evaluate the hotTileOcc default")

    // the SHIPPED mitigation: heavy tiles resolve by broadcast and
    // never shuffle — worst share at most half of either hazard arm
    assert(split.worstShareRows <= win.worstShareRows / 2,
      s"hotsplit did not mitigate vs window: ${split.worstShareRows}")
    assert(split.worstShareRows <= plain.worstShareRows / 2,
      s"hotsplit did not mitigate vs plain join: ${split.worstShareRows}")

    // mitigation must never change semantics
    assert(p.arms.map(_.result).distinct.size === 1,
      "arms disagree on the per-doc relation")
  }

  test("committed passage-skew artifact parses and every law it claims holds") {
    // same discipline as ScaleProbeSpec's artifact re-assertion: a
    // regenerated SCALE_r19_passage_skew.json cannot silently carry a
    // failing law
    val f = new java.io.File("SCALE_r19_passage_skew.json")
    assert(f.isFile, "committed artifact SCALE_r19_passage_skew.json missing")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(f)
    val laws = root.get("laws")
    assert(laws != null && laws.isObject, "artifact has no laws block")
    laws.properties().forEach { e =>
      assert(e.getValue.asBoolean(), s"artifact law ${e.getKey} is false")
    }
    assert(root.get("arms").size() === 4, "artifact must carry all four arms")
  }
}
