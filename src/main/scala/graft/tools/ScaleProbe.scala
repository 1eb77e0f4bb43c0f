package graft.tools

import org.apache.spark.sql.SparkSession

/** Registry-wide EMPIRICAL scale probe (VERDICT r10 next-round #1):
  * runs the most expensive query families against a 1× and a k×
  * synthetically inflated corpus ([[Inflate]]) and records how output
  * rows, exchanged shuffle bytes/rows, and wall time actually grow —
  * converting every "candidate volume is linear by construction"
  * scaladoc claim into a measured fact.
  *
  * What linear growth means here: a family whose cost is linear in the
  * corpus should see shuffle volume and output grow by ≈ k under k×
  * inflation. A family with a hidden quadratic choke point (the r9
  * fixed-cardinality blocking key was the canonical example: fixed
  * block count ⇒ block population ∝ n ⇒ pair volume ∝ n²) shows ≈ k²
  * growth — at k = 10 that is 100× vs 10×, unmistakable even through
  * fixed-overhead noise. Shuffle BYTES are the primary signal (they
  * are the 100 TB cost model and deterministic up to partition-count
  * jitter); wall time is recorded but advisory on a shared host.
  *
  * The spec ([[graft.ScaleProbeSpec]]) asserts the growth law at small
  * scale on every probed batch family; `runMain graft.tools.ScaleProbe`
  * writes the full observation table (default sf0.01, k=10) as a
  * driver-visible JSON artifact.
  *
  * Deliberately NOT probed: `sim_neardup_lsh`'s static 6×3 embedding
  * banding, whose candidate mass is KNOWN quadratic beyond its
  * declared envelope — that family is guarded by an explicit candidate
  * budget that fails loudly with the autoBitsPerBand re-banding
  * suggestion (SimilarityQueries.NearDupCandidateBudget) rather than
  * claiming linearity; probing it would just trip its own guard.
  */
object ScaleProbe {

  /** One probed family. `coupled = true` marks a WORKLOAD-COUPLED
    * self-join query — one whose query set is itself derived from the
    * corpus (bm25's every-37th-doc split, the all-vectors kNN join) —
    * so under k× inflation BOTH sides of the probe join grow and total
    * work is |Q|·cost(corpus) ≈ k². That is the workload's true shape,
    * not a defect: the 100 TB deployment either pins the query set
    * (contamination scans) or knowingly pays |Q| passes. The law such
    * a family must satisfy is therefore PER-QUERY: cost divided by
    * query volume grows ≤ linearly with the corpus. */
  final case class Family(query: String, claim: String, coupled: Boolean = false)

  final case class Obs(query: String, claim: String, coupled: Boolean, k: Int,
      rows1: Long, rowsK: Long, bytes1: Long, bytesK: Long,
      srows1: Long, srowsK: Long, wall1: Double, wallK: Double) {
    def bytesRatio: Double = ratio(bytes1, bytesK)
    def rowsRatio: Double = ratio(rows1, rowsK)
    private def ratio(a: Long, b: Long): Double =
      if (a <= 0) (if (b <= 0) 1.0 else Double.PositiveInfinity) else b.toDouble / a
    /** The growth law: k× data may grow each signal by at most
      * `margin·k` beyond a small absolute floor (fixed per-partition /
      * per-batch overheads dominate tiny baselines). A coupled family
      * gets the extra query-volume factor (its output rows track its
      * query count — fixed top-k per query), i.e. the assertion becomes
      * per-query linearity; a quadratic-per-query regression would
      * still show ≈ k³ total and fail. */
    def linearOk(margin: Double = 2.0): Boolean = {
      val workload = if (coupled) math.max(rowsRatio, 1.0) else 1.0
      def ok(base: Long, big: Long, floor: Long): Boolean =
        big.toDouble <= base.toDouble * margin * k * workload + floor
      ok(bytes1, bytesK, 2L << 20) && ok(rows1, rowsK, 1000L) &&
        ok(srows1, srowsK, if (coupled) 100000L else 10000L)
    }
  }

  /** The heavy families the r10 verdict named, plus the cheap
    * scan-shaped q1 as a control whose linearity is not in doubt. */
  val batchFamilies: Seq[Family] = Seq(
    Family("dedup_allpairs_jaccard",
      "Bayardo prefix filter: candidates bounded by rare-token postings, linear in corpus"),
    Family("dedup_levenshtein_block",
      "sorted neighborhood: exactly n*window candidates at any corpus size"),
    Family("dedup_snm_multipass",
      "multi-pass SNM: passes*n*window candidates, ids-width cross-pass distinct"),
    Family("dedup_minhash_pairs",
      "banded MinHash LSH: candidate volume follows band-bucket collisions, linear for non-duplicated growth"),
    Family("dedup_clusters",
      "LSH candidates + size-switched connected components, linear edges"),
    Family("dedup_exact", "fingerprint hash-groupBy, one linear shuffle"),
    Family("text_bm25_topk",
      "posting probe: per-QUERY scoring cost linear in corpus (query split itself grows with the corpus)",
      coupled = true),
    Family("text_winnowing", "per-doc winnowing fingerprints, map-side linear"),
    Family("graph_triangles",
      "degree-ordered orientation: wedge volume O(m^1.5), linear-ish at constant density"),
    Family("cdc_merge_snapshot",
      "changelog collapsed to |keys| before the full-outer merge"),
    Family("sim_knn_join_lsh",
      "LSH kNN join: per-QUERY probe cost linear in corpus (every vector is a query)",
      coupled = true),
    Family("text_tfidf", "per-(doc, term) postings, linear in corpus tokens"),
    Family("dedup_winnowing_candidates",
      "winnowing fingerprints hash-banded, ids-only shuffle"),
    Family("scd2_history", "per-key ordered windows, one keyed shuffle"),
    Family("budget_select_tokens",
      "two-pass distributed prefix sum; output bounded by the token budget"),
    Family("corpus_pack_windows", "sequence packing, shuffle-budgeted"),
    Family("events_resample", "per-user gap fill, keyed shuffle linear in events"),
    Family("q1_pricing_summary", "scan + map-side partial agg control"))

  /** Streamed families: stream==batch gate machinery, measured by
    * output rows and wall only (the streaming job's exchanges are not
    * visible on the returned batch frame). */
  val streamedFamilies: Seq[Family] = Seq(
    Family("dedup_incremental_streamed",
      "state-store incremental dedup: state and per-batch work linear in keys"),
    Family("cdc_merge_streamed",
      "streamed changelog compaction + merge: state linear in keys"),
    Family("tumbling_window_streamed",
      "watermarked windowed agg: state bounded by open windows"))

  /** Inflate `srcDir` k-fold under a scratch dir; returns the corpus
    * dir. Callers delete it with [[cleanup]] when done — a k=10 sf0.01
    * corpus is ~100 MB of /tmp that would otherwise outlive the run. */
  def inflateTo(spark: SparkSession, srcDir: String, k: Int): String = {
    val dest = java.nio.file.Files.createTempDirectory(s"graft_scale_${k}x").toString
    Inflate.corpus(spark, srcDir, dest, k)
    dest
  }

  /** Recursively deletes an inflated scratch corpus. */
  def cleanup(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
  }

  private def timedMeasure(spark: SparkSession, dir: String, q: String):
      (ShuffleAudit.Volumes, Double) = {
    val t0 = System.nanoTime()
    val v = ShuffleAudit.measure(graft.SparkEntry.queries(q)(spark, dir))
    val wall = (System.nanoTime() - t0) / 1e9
    // persisted intermediates (signal tables, minhash frames) must not
    // leak across scales or the k× run would probe the 1× run's cache
    spark.catalog.clearCache()
    (v, wall)
  }

  /** Runs each query against both corpora and pairs the observations. */
  def observe(spark: SparkSession, dir1: String, dirK: String, k: Int,
      families: Seq[Family]): Seq[Obs] =
    families.map { f =>
      val (v1, w1) = timedMeasure(spark, dir1, f.query)
      val (vK, wK) = timedMeasure(spark, dirK, f.query)
      Obs(f.query, f.claim, f.coupled, k, v1.outputRows, vK.outputRows,
        v1.shuffleBytes, vK.shuffleBytes, v1.shuffleRows, vK.shuffleRows, w1, wK)
    }

  def json(obs: Seq[Obs], sfDir: String, margin: Double): String = {
    val rows = obs.map { o =>
      f"""{"query":"${o.query}","claim":"${o.claim}","coupled":${o.coupled},"k":${o.k},""" +
        f""""rows":[${o.rows1},${o.rowsK}],"shuffle_bytes":[${o.bytes1},${o.bytesK}],""" +
        f""""shuffle_rows":[${o.srows1},${o.srowsK}],""" +
        f""""wall_s":[${o.wall1}%.3f,${o.wallK}%.3f],""" +
        f""""bytes_ratio":${if (o.bytesRatio.isInfinity) -1.0 else o.bytesRatio}%.2f,""" +
        f""""rows_ratio":${if (o.rowsRatio.isInfinity) -1.0 else o.rowsRatio}%.2f,""" +
        f""""linear_ok":${o.linearOk(margin)}}"""
    }.mkString("[", ",", "]")
    s"""{"probe":"inflation","sf":"$sfDir","margin":$margin,""" +
      s""""note":"linear_ok: kx growth of shuffle bytes/rows and output rows stays under margin*k plus a fixed-overhead floor; coupled=true families (query set derived from the corpus, so both join sides grow) get the additional query-volume factor, i.e. PER-QUERY linearity; wall_s advisory","families":$rows}"""
  }

  /** `runMain graft.tools.ScaleProbe [sfDir] [k] [outPath] [q1,q2,...]`
    * — the optional 4th arg restricts to a comma-separated family
    * subset (e.g. a deep k=100 run over the cheap strictly-linear
    * families; the full set at k=100 would spend minutes proving the
    * coupled self-joins quadratic, which k=10 already shows). */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val outPath = args.lift(2).getOrElse("SCALE_r11.json")
    val only = args.lift(3).map(_.split(",").toSet)
    val spark = graft.sources.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val dir1 = inflateTo(spark, sfDir, 1)
    val dirK = inflateTo(spark, sfDir, k)
    val families = (batchFamilies ++ streamedFamilies)
      .filter(f => only.forall(_.contains(f.query)))
    val obs =
      try observe(spark, dir1, dirK, k, families)
      finally { cleanup(dir1); cleanup(dirK) }
    val out = json(obs, sfDir, margin = 2.0)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (out + "\n").getBytes("UTF-8"))
    obs.foreach(o => println(
      f"[scale] ${o.query}%-28s rows ${o.rows1}%7d -> ${o.rowsK}%8d  " +
        f"bytes ${o.bytes1}%10d -> ${o.bytesK}%11d (x${if (o.bytesRatio.isInfinity) -1 else o.bytesRatio}%.1f)  " +
        f"wall ${o.wall1}%5.2f -> ${o.wallK}%6.2f s  linear_ok=${o.linearOk()}"))
    println(s"[scale] artifact written to $outPath")
    spark.stop()
  }
}
