package graft

import graft.tools.ScaleProbe

/** The measured growth law (VERDICT r10 next-round #1): every heavy
  * query family's "cost is linear in the corpus" scaladoc claim,
  * checked EMPIRICALLY by running the family against a 1× and a k×
  * inflated corpus ([[graft.tools.Inflate]]) and bounding the growth of
  * shuffle volume and output.
  *
  * This is the generalization of SortedNeighborhoodSpec's 10×-inflation
  * law to the whole registry's expensive families: a hidden quadratic
  * choke point (fixed-cardinality blocking, an accidental cross-copy
  * pair explosion, a collapsed-to-driver loop re-expanding) shows ≈ k²
  * growth where the law allows ≈ k — at k = 5 that is 25× vs the
  * allowed ~10×, decisive even on a noisy host because the primary
  * signals (shuffle bytes/rows, output rows) are deterministic.
  * Wall time is intentionally NOT asserted here (shared-host noise);
  * the driver-visible artifact from `runMain graft.tools.ScaleProbe`
  * records it alongside.
  */
class ScaleProbeSpec extends SparkSpec {

  test("heavy families grow ~linearly under 5x corpus inflation (shuffle + output)") {
    val k = 5
    val dir1 = ScaleProbe.inflateTo(spark, sf, 1)
    val dirK = ScaleProbe.inflateTo(spark, sf, k)
    val obs =
      try ScaleProbe.observe(spark, dir1, dirK, k, ScaleProbe.batchFamilies)
      finally { ScaleProbe.cleanup(dir1); ScaleProbe.cleanup(dirK) }
    val bad = obs.filterNot(_.linearOk(margin = 2.0)).map(o =>
      s"${o.query}: rows ${o.rows1}->${o.rowsK}, shuffleBytes ${o.bytes1}->" +
        s"${o.bytesK} (x${f"${o.bytesRatio}%.1f"}), shuffleRows ${o.srows1}->${o.srowsK}")
    assert(bad.isEmpty,
      s"super-linear growth under ${k}x inflation (allowed ≤ 2*k + floor):\n  " +
        bad.mkString("\n  "))
    // the probe must actually exercise inflation: the kx corpus has to
    // produce MORE work than 1x somewhere, or the assertion is vacuous
    assert(obs.count(o => o.bytesK > o.bytes1) >= obs.size / 2,
      "inflation produced no extra shuffle volume for most families — probe broken?")
    // and every family has to produce output at 1x — a zero-row run
    // means the query silently saw no data (the streamed pathGlobFilter
    // trap) and its "linear growth" is vacuous
    val empty = obs.filter(_.rows1 === 0L).map(_.query)
    assert(empty.isEmpty, s"families with zero 1x output (probe not exercised): $empty")
  }

  test("derived-knob banded families grow ~linearly under 4x inflation") {
    // VERDICT r11 ask #2 in CI form: the banded/quadratic-risk families
    // probed with the banding re-derived from corpus size (the
    // sim_neardup_autoband builder re-computes bitsPerBand per corpus);
    // the committed k=30 artifact is the deep form of the same run.
    val k = 4
    val dir1 = ScaleProbe.inflateTo(spark, sf, 1)
    val dirK = ScaleProbe.inflateTo(spark, sf, k)
    val obs =
      try ScaleProbe.observe(spark, dir1, dirK, k, ScaleProbe.bandedFamilies)
      finally { ScaleProbe.cleanup(dir1); ScaleProbe.cleanup(dirK) }
    val bad = obs.filterNot(_.linearOk(margin = 2.0)).map(o =>
      s"${o.query}: rows ${o.rows1}->${o.rowsK}, shuffleBytes ${o.bytes1}->" +
        s"${o.bytesK} (x${f"${o.bytesRatio}%.1f"})")
    assert(bad.isEmpty, s"banded families super-linear at ${k}x:\n  " + bad.mkString("\n  "))
    assert(obs.forall(_.rows1 > 0), "every banded family must produce 1x output")
    // the autoband row must actually derive its knob
    assert(obs.exists(o => o.query == "sim_neardup_autoband" && o.knob.contains("autoBitsPerBand")))
  }

  test("measureTotal sees construction-time shuffles the plan walk is blind to") {
    // ADVICE r11 (medium) in regression form: a family that runs its
    // heavy shuffle EAGERLY at build time and returns a checkpointed
    // scan must still be charged for it. measure() (executed-plan walk)
    // sees ~nothing; measureTotal() (listener window) sees the groupBy
    // exchange — if this inverts, every eager family's probe row is
    // vacuous again.
    import org.apache.spark.sql.functions._
    def build() = spark.range(0, 50000)
      .select((col("id") % 997).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val eager = build()
    try {
      val walk = graft.tools.ShuffleAudit.measure(eager)
      assert(walk.shuffleBytes === 0L,
        "fixture drifted: the checkpointed scan should hide its build shuffle")
    } finally eager.rdd.unpersist(true)
    var eager2: org.apache.spark.sql.DataFrame = null
    val window = graft.tools.ShuffleAudit.measureTotal(spark) {
      eager2 = build(); eager2
    }
    try assert(window.shuffleBytes > 0L,
      "listener window missed the construction-time shuffle")
    finally eager2.rdd.unpersist(true)
  }

  test("negative control: a genuinely quadratic workload fails linearOk end-to-end") {
    // The probe machinery must be ABLE to fail: run a real all-pairs
    // blowup (every row pairs with every row, pair keys distinct so
    // map-side combine cannot collapse them) through the same
    // measureTotal + Obs.linearOk path the artifact rows use, at k=3.
    // bytes/shuffle-rows grow ~k² = 9 > the allowed 2k = 6 — the law
    // must reject it, and the same shape joined on a UNIQUE key (linear
    // pair volume) must pass.
    import org.apache.spark.sql.functions._
    def pairs(n: Long, quadratic: Boolean) = {
      val key: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (quadratic) _ => lit(1L) else identity
      val l = spark.range(0, n).select(key(col("id")).as("b"), col("id").as("x"))
      val r = spark.range(0, n).select(key(col("id")).as("b"), col("id").as("y"))
      l.join(r, "b").select((col("x") * 1000000L + col("y")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("c"))
        .groupBy().agg(count(lit(1)).as("n_pairs"))
    }
    def obs(quadratic: Boolean) = {
      val v1 = graft.tools.ShuffleAudit.measureTotal(spark)(pairs(1000, quadratic))
      val vK = graft.tools.ShuffleAudit.measureTotal(spark)(pairs(3000, quadratic))
      ScaleProbe.Obs("control", "negative control", coupled = false, 3,
        v1.outputRows, vK.outputRows, v1.shuffleBytes, vK.shuffleBytes,
        v1.shuffleRows, vK.shuffleRows, 0.0, 0.0)
    }
    val quad = obs(quadratic = true)
    assert(quad.srowsK > 5 * quad.srows1,
      s"fixture drifted: expected ~k² pair-row growth, got ${quad.srows1} -> ${quad.srowsK}")
    assert(!quad.linearOk(), "the law accepted a quadratic workload")
    assert(obs(quadratic = false).linearOk(), "the law rejected a linear workload")
  }

  test("growth law: coupled workload factor is the known k, not the observed rows ratio") {
    // ADVICE r11: rowsRatio as the workload factor was self-referencing
    // (bound scaled with the signal it constrains) and rows1 == 0 gave
    // an infinite allowance. Pinned: the factor is exactly k, and an
    // empty 1x baseline FAILS.
    def obs(rows1: Long, rowsK: Long, bytes1: Long, bytesK: Long,
        coupled: Boolean, k: Int = 10) =
      ScaleProbe.Obs("t", "c", coupled, k, rows1, rowsK, bytes1, bytesK,
        0L, 0L, 0.0, 0.0)
    // coupled: bytes may grow ~k^2 (per-query linearity) but not k^3
    assert(obs(100, 1000, 1L << 22, (1L << 22) * 150, coupled = true).linearOk())
    assert(!obs(100, 1000, 1L << 22, (1L << 22) * 250, coupled = true).linearOk())
    // coupled OUTPUT rows grow k (top-k per query), not k^2: 100x rows fails
    assert(!obs(100000, 10000000, 1L << 22, 1L << 23, coupled = true).linearOk())
    // non-coupled: bytes growth beyond margin*k fails
    assert(!obs(100, 1000, 1L << 22, (1L << 22) * 25, coupled = false).linearOk())
    // empty 1x baseline with non-empty kx output: probe failure, not allowance
    assert(!obs(0, 500, 0, 1L << 30, coupled = true).linearOk())
    assert(!obs(0, 500, 0, 1L << 30, coupled = false).linearOk())
  }

  test("committed scale artifacts parse and every row passes its own law") {
    // VERDICT r11 ask #4: the committed probe artifacts were unchecked
    // output — a regenerated artifact could silently carry a failing
    // family. This parses the repo-root artifacts and re-asserts.
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    for (name <- Seq("SCALE_r12.json", "SCALE_r12_deep.json",
        "SCALE_r12_banded.json", "SCALE_r12_fixedq.json",
        "SCALE_r14.json", "SCALE_r14_deep.json",
        "SCALE_r15.json", "SCALE_r15_banded.json", "SCALE_r16.json",
        "SCALE_r17.json", "SCALE_r18.json", "SCALE_r18_deep.json",
        "SCALE_r19.json", "SCALE_r19_deep.json")) {
      val f = new java.io.File(name)
      assert(f.isFile, s"committed artifact $name missing from repo root")
      val root = om.readTree(f)
      val fams = root.get("families")
      assert(fams != null && fams.isArray && fams.size() > 0, s"$name: no families")
      fams.forEach { row =>
        val q = row.get("query").asText()
        assert(row.get("linear_ok").asBoolean(), s"$name/$q: linear_ok false")
        assert(row.get("rows").get(0).asLong() > 0, s"$name/$q: empty 1x output")
        assert(row.has("coupled"), s"$name/$q: coupled tag missing")
        // coupled rows pass only under the per-query reading — the tag
        // must be present AND the shuffle growth must actually exceed
        // plain-linear for the tag to be load-bearing; nothing to
        // assert beyond its presence + the law re-check above, which
        // Obs.linearOk already encodes (factor k, not rows ratio).
      }
    }
  }

  test("inflation salts 0/1-word documents too (unconditional per-copy prefix)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // ADVICE r11: the interleave-only salt left whitespace-free texts
    // byte-identical across copies, reintroducing cross-copy duplicate
    // mass for exactly the degenerate docs dedup families over-count.
    val df = Seq("word", "", "two words").toDF("text")
    val salted = (0 until 3).map(i =>
      df.select(graft.tools.Inflate.saltText(col("text"), i).as("t"))
        .as[String].collect().toSeq)
    for (a <- 0 until 3; b <- (a + 1) until 3; r <- salted(a).indices)
      assert(salted(a)(r) != salted(b)(r),
        s"copy $a and $b share salted text '${salted(a)(r)}'")
  }

  test("inflation preserves within-copy structure and separates copies") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = 3
    // documents: the interleaved salt keeps copies shingle-disjoint —
    // 3-shingles of copy 0 and copy 1 share nothing
    val docs = graft.tools.Inflate.table(spark, sf, "documents", k)
    val sh = docs.select(col("doc_id"),
      graft.functions.TextFunctions.shingles(col("text"), 3).as("s"))
      .withColumn("copy", (col("doc_id") / lit(graft.tools.Inflate.keyOffset)).cast("int"))
    val cross = sh.filter(col("copy") === 0).select(explode(col("s")).as("t")).distinct()
      .join(sh.filter(col("copy") === 1).select(explode(col("s")).as("t")).distinct(), "t")
      .count()
    assert(cross === 0L, "copies must not share shingles (cross-copy Jaccard 0)")
    // embeddings: sign flips are orthogonal — within-copy dot products
    // are preserved exactly vs the base corpus
    val base = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1).take(3)
    val flipped = graft.tools.Inflate.table(spark, sf, "embeddings", 2)
      .filter(col("vec_id") >= graft.tools.Inflate.keyOffset)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1).take(3)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    for (i <- base.indices; j <- base.indices) {
      val d0 = dot(base(i)._2, base(j)._2)
      val d1 = dot(flipped(i)._2, flipped(j)._2)
      assert(math.abs(d0 - d1) < 1e-3,
        s"sign flip must preserve within-copy dot products: $d0 vs $d1")
    }
  }
}
