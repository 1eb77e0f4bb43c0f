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
