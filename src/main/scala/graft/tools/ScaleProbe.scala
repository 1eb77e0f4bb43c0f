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
  * Deliberately NOT probed as-registered: `sim_neardup_lsh`'s static
  * 6×3 embedding banding, whose candidate mass is KNOWN quadratic
  * beyond its declared envelope — that family is guarded by an
  * explicit candidate budget that fails loudly with the
  * autoBitsPerBand re-banding suggestion rather than claiming
  * linearity; probing the static config would just trip its own
  * guard. The RE-BANDED form IS probed: [[bandedFamilies]]'s
  * `sim_neardup_autoband` re-derives `bitsPerBand` per corpus and
  * carries the k=30 receipt (`SCALE_r12_banded.json`).
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
    * query volume grows ≤ linearly with the corpus.
    *
    * `builder`: an optional query builder replacing the registry entry —
    * the vehicle for DERIVED-KNOB probes, where the banding/bits/window
    * is re-derived from the corpus size per the planner-table discipline
    * (`Similarity.autoBitsPerBand` growing with log₂ n) instead of the
    * registered compile-time config the DuckDB oracle needs. `knob`
    * documents the derivation and lands in the artifact row.
    *
    * `warm`: one-off signal builds to run BEFORE the measurement window
    * — the probe analog of the bench's `prep` accounting. An
    * index-probing family measured in a SUBSET run would otherwise
    * swallow the ingest-side index build into its tally (order-
    * dependent: in a full run an earlier family pays it), and the
    * build's shuffle profile does not follow the probe's growth law. */
  final case class Family(query: String, claim: String, coupled: Boolean = false,
      builder: Option[(SparkSession, String) => org.apache.spark.sql.DataFrame] = None,
      knob: String = "",
      warm: Option[(SparkSession, String) => Unit] = None)

  final case class Obs(query: String, claim: String, coupled: Boolean, k: Int,
      rows1: Long, rowsK: Long, bytes1: Long, bytesK: Long,
      srows1: Long, srowsK: Long, wall1: Double, wallK: Double,
      knob: String = "") {
    def bytesRatio: Double = ratio(bytes1, bytesK)
    def rowsRatio: Double = ratio(rows1, rowsK)
    private def ratio(a: Long, b: Long): Double =
      if (a <= 0) (if (b <= 0) 1.0 else Double.PositiveInfinity) else b.toDouble / a
    /** The growth law: k× data may grow each signal by at most
      * `margin·k` beyond a small absolute floor (fixed per-partition /
      * per-batch overheads dominate tiny baselines). A coupled family's
      * shuffle signals get the KNOWN query-volume factor — exactly `k`,
      * since its query set is corpus-derived, so total work is
      * |Q|·cost(corpus) and the bound becomes per-query linearity.
      * (Deriving the factor from the OBSERVED rows ratio would be
      * self-referencing: the bound would scale with the very signal it
      * is meant to constrain.) Output rows are NOT workload-scaled even
      * when coupled — top-k per query grows the output by k, not k².
      * An empty 1× baseline certifies nothing: rows1 == 0 with rowsK > 0
      * is a probe failure, not an infinite allowance — and SYMMETRICALLY
      * an empty k× observation (rowsK == 0 with rows1 > 0, e.g. a copy-0
      * pin applied to the wrong side so the inflated corpus contributes
      * nothing) measured nothing at scale and must read as FAIL, not as
      * trivially-under-the-bound. */
    def linearOk(margin: Double = 2.0): Boolean = {
      if (rows1 <= 0 && rowsK > 0) return false
      if (rows1 > 0 && rowsK <= 0) return false
      val workload = if (coupled) k.toDouble else 1.0
      def ok(base: Long, big: Long, floor: Long, w: Double): Boolean =
        big.toDouble <= base.toDouble * margin * k * w + floor
      ok(bytes1, bytesK, 2L << 20, workload) && ok(rows1, rowsK, 1000L, 1.0) &&
        ok(srows1, srowsK, if (coupled) 100000L else 10000L, workload)
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
      "LSH candidates + size-switched connected components, linear edges",
      knob = "first consumer of the neardup_pairs signal: this row's tally INCLUDES the MinHash banding build for both corpora"),
    Family("dedup_exact", "fingerprint hash-groupBy, one linear shuffle"),
    Family("dedup_passages",
      "scan-side tiling; map-combined groupBy(passage).count + join-back, heavy tiles broadcast (hotTileOcc) — r19, the family the r18 verdict flagged as receipt-less; hot-tile concentration measured separately by PassageSkewProbe"),
    Family("dedup_passage_rewrite",
      "same tiling/count as dedup_passages + doc-keyed reassembly whose collected payload is the document itself — linear in corpus bytes"),
    Family("dedup_passage_screen",
      "ingest screen: arriving (src0) tiles left-join the standing per-passage count table + per-doc rollup — history side one map-combined agg, probe side batch-sized"),
    Family("text_bm25_topk",
      "posting probe: per-QUERY scoring cost linear in corpus (query split itself grows with the corpus)",
      coupled = true),
    Family("text_winnowing", "per-doc winnowing fingerprints, map-side linear"),
    Family("graph_triangles",
      "degree-ordered orientation: wedge volume O(m^1.5), linear-ish at constant density",
      knob = "probes the neardup_pairs signal memoized by dedup_clusters (listed earlier): this row's tally is the triangle joins alone, both scales symmetric"),
    Family("cdc_merge_snapshot",
      "changelog collapsed to |keys| before the full-outer merge"),
    Family("sim_knn_join_lsh",
      "LSH kNN join: per-QUERY probe cost linear in corpus (every vector is a query)",
      coupled = true),
    Family("text_tfidf", "per-(doc, term) postings, linear in corpus tokens"),
    Family("dedup_winnowing_candidates",
      "winnowing fingerprints hash-banded, ids-only shuffle"),
    Family("dedup_leakage_split",
      "per-cluster split: one join against the components signal + map-side md5 parity",
      knob = "consumes the neardup_clusters signal memoized by dedup_clusters (listed earlier); this row's tally is the split join alone"),
    Family("decontam_eval_overlap",
      "cross-split winnowing overlap: capped postings bound the pair join; split joins keyed, linear",
      knob = "shares the memoized split inputs with dedup_leakage_split; the fingerprint pass is map-side"),
    Family("dedup_incremental_neardup",
      "ingest-batch probe into the banded index: batch-sized map work, keyed bucket join, component delta bounded by the batch's matches",
      knob = "prior state (cluster labels, band index, shingle store) is memoized per corpus, so each scale's tally includes its own one-time state build — the probe itself is the marginal cost"),
    Family("dedup_retract_clusters",
      "takedown path: anti-joins on the persisted state + re-closing only the affected components",
      knob = "consumes the neardup_pairs/neardup_clusters signals memoized by dedup_clusters (listed earlier); this row's tally is the retraction alone"),
    Family("scd2_history", "per-key ordered windows, one keyed shuffle"),
    Family("budget_select_tokens",
      "two-pass distributed prefix sum; output bounded by the token budget"),
    Family("corpus_pack_windows", "sequence packing, shuffle-budgeted"),
    Family("events_resample", "per-user gap fill, keyed shuffle linear in events"),
    Family("q1_pricing_summary", "scan + map-side partial agg control"),
    Family("agg_topk_per_key_salted",
      "two-level salted top-k: level-1 partials capped at k per (key, salt), level-2 merge input <= salts rows / salts*k values per key, shuffle linear in input",
      builder = Some { (s: SparkSession, d: String) =>
        import org.apache.spark.sql.functions._
        // the volume receipt runs the registered query's exact shape;
        // the merge-input BOUND is measured (not asserted) off the
        // exposed level-1 frame and fails the arm loudly if the
        // semilattice cap ever leaks (VERDICT r13 task 4)
        val ev = graft.sources.Tables.events(s, d)
        val bound = graft.operators.Salting
          .topKPartials(ev, "user_id", "event_id", k = 25, salts = 8)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("nparts"), sum(size(col("__part"))).as("nvals"))
          .agg(max(col("nparts")).as("max_parts"), max(col("nvals")).as("max_vals"))
          .head()
        require(bound.getLong(0) <= 8 && bound.getLong(1) <= 8L * 25,
          s"level-2 merge input exceeded salts/salts*k per key: $bound")
        graft.operators.Salting.topKPerKey(
            ev, "user_id", "event_id", k = 25, salts = 8)
          .orderBy(col("user_id"), col("rank"))
      },
      knob = "salts=8, k=25; builder measures the level-2 merge input per key off the exposed level-1 partials and requires <= salts rows and <= salts*k values (the capped-semilattice law), then runs the registered query"),
    // FIXED-WORKLOAD arms for the two coupled families (VERDICT r11
    // what's-wrong #2 strengthened): the coupled rows pass only under
    // the per-query reading because their query sets grow with the
    // corpus; these arms PIN the query set to copy 0, so |Q| is
    // constant across scales and the per-query-linearity claim becomes
    // a DIRECTLY measured plain-linear law — the "deployment pins the
    // query set" story (contamination scans), executed. Listed after
    // their coupled counterparts so the memoized posting index is
    // already built and the arm measures the probe alone.
    Family("text_bm25_topk_fixedq",
      "PINNED %37 query set over a growing corpus: probe cost linear in postings",
      builder = Some { (s: SparkSession, d: String) =>
        import org.apache.spark.sql.functions._
        val queries = graft.sources.Tables.documents(s, d)
          .filter(col("doc_id") % 37 === 0 && col("doc_id") < Inflate.keyOffset)
          .select(col("doc_id").as("query_id"),
            explode(array_distinct(
              graft.functions.TextFunctions.tokens(col("text")))).as("t"))
        // postings DOC-co-located for the probe: under the memoized
        // index's as-is layout the (query, doc) partial agg's combine
        // ratio depends on how many partitions a pair's term hits span
        // — physical history, shifting between scales (measured: srows
        // x9.8 at k=10 but x111 at k=30 while joinRows x28.2 and
        // distinct pairs x30.0 stayed exactly linear — FixedQProbe).
        // Repartitioning by doc_id pins every pair's contributions to
        // one task, making the combine scale-invariant: srows x29.9 at
        // k=30. The repartition itself is one linear postings exchange.
        graft.queries.RetrievalQueries.bm25ProbeDenorm(queries,
          graft.queries.RetrievalQueries.postingsIndex(s, d)
            .filter(col("doc_id") % 37 =!= 0)
            .repartition(col("doc_id")), k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      knob = "query set pinned to copy 0 (doc_id < keyOffset): |Q| constant across scales, plain-linear law, no coupled factor; posting-index signal warmed outside the window (ingest-side, bench-prep accounting); postings doc-co-located so the partial-agg combine ratio is scale-invariant (see builder comment)",
      warm = Some((s: SparkSession, d: String) => {
        graft.queries.RetrievalQueries.postingsIndex(s, d); ()
      })),
    Family("sim_topk_lsh_fixedq",
      "PINNED %50 query set LSH top-k over a growing corpus: per-probe cost linear",
      builder = Some { (s: SparkSession, d: String) =>
        import org.apache.spark.sql.functions._
        val emb = graft.sources.Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") % 50 === 0 &&
          col("vec_id") < Inflate.keyOffset)
        graft.operators.Similarity.lshTopK(emb, q, "vec_id", "embedding", k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      knob = "query set pinned to copy 0 (vec_id < keyOffset): |Q| constant across scales, plain-linear law, no coupled factor"))

  /** Streamed families: stream==batch gate machinery. Since the r12
    * listener-based measurement ([[ShuffleAudit.measureTotal]]) the
    * streaming job's micro-batch stages land in the shuffle accounting
    * too, so these rows carry real exchange volumes, not just output
    * rows and wall. The three transformWithState rows are VERDICT r11
    * ask #7 — the family with the least scale evidence gets
    * state-linear growth receipts. */
  val streamedFamilies: Seq[Family] = Seq(
    Family("dedup_incremental_streamed",
      "state-store incremental dedup: state and per-batch work linear in keys"),
    Family("cdc_merge_streamed",
      "streamed changelog compaction + merge: state linear in keys"),
    Family("tumbling_window_streamed",
      "watermarked windowed agg: state bounded by open windows"),
    Family("session_tws_streamed",
      "transformWithState gap sessions: one ValueState interval list per user, state linear in users"),
    Family("type_counts_tws_streamed",
      "transformWithState MapState counts: one map entry per (user, type), state linear in keys"),
    Family("user_recent_events_streamed",
      "transformWithState ListState recent-k buffer: state capped at k rows per user, linear in users"))

  /** DERIVED-KNOB banded families (VERDICT r11 ask #2): the families
    * whose 100× behavior depends on a banding/bits knob, probed with
    * the knob RE-DERIVED from the corpus size per the planner-table
    * discipline instead of the compile-time config the DuckDB oracles
    * pin. The flagship is the hyperplane near-dup family, which the
    * r11 probe deliberately EXCLUDED because its registered static 6×3
    * banding trips its own candidate budget beyond ~2× — with
    * `bitsPerBand = autoBitsPerBand(n)` the same operator probes
    * linear, demonstrating the re-banding discipline DEPLOYMENT.md
    * prescribes rather than asserting it. */
  val bandedFamilies: Seq[Family] = Seq(
    Family("dedup_minhash_pairs",
      "banded MinHash LSH: bucket keys are minhash tuples, collision mass similarity-driven not size-driven",
      knob = "registered 4-band/16-hash banding; bucket key entropy grows with corpus, no derivation needed"),
    Family("dedup_clusters",
      "LSH candidates + size-switched connected components, linear edges",
      knob = "registered banding; CC switches driver union-find -> iterative label-prop past 1M edges (ComponentsCrossover-measured gate)"),
    Family("dedup_winnowing_candidates",
      "winnowing fingerprints hash-banded, ids-only shuffle",
      knob = "window-4 winnowing: fingerprint count per doc fixed by content, bucket key = (hash, gram) exact"),
    Family("dedup_snm_multipass",
      "multi-pass SNM: passes*n*window candidates at any corpus size",
      knob = "window=10 per pass by design: candidate count n*w is linear in n with w corpus-independent"),
    Family("dedup_allpairs_jaccard",
      "Bayardo prefix filter: candidates bounded by rare-token postings",
      knob = "no knob: prefix length adapts per-record from the global token-frequency order"),
    Family("dedup_incremental_neardup",
      "ingest-batch probe into the banded index at 30x: batch work and bucket-join mass stay corpus-linear",
      knob = "registered 4-band/16-hash minhash banding — bucket keys are minhash tuples (entropy grows with content, same no-derivation argument as dedup_minhash_pairs); each scale's tally includes its own one-time prior-state build"),
    Family("sim_neardup_autoband",
      "hyperplane LSH near-dup with bits re-derived per corpus: bucket size pinned, candidates linear",
      builder = Some { (s: SparkSession, d: String) =>
        import org.apache.spark.sql.functions._
        val emb = graft.sources.Tables.embeddings(s, d)
        val n = emb.count()
        val bits = graft.operators.Similarity.autoBitsPerBand(n)
        // Output collapsed to a per-corpus summary ROW: the pair LIST
        // at threshold 0.4 is a DATA property, not an operator cost —
        // in 64 dims the coincidence mass above cosine 0.4 grows ~n²
        // for ANY genuinely-new vectors (observed: 48 → ~10k pairs at
        // k=30), so asserting ≤k output growth on it would test the
        // fixture's geometry, not the banding. The operator's COST —
        // the banding pass, candidate dedup, and verify join, i.e. the
        // shuffle bytes/rows this probe actually measures — is what
        // the re-derived bits keep linear.
        graft.operators.Similarity.nearDupPairsLsh(emb, "vec_id", "embedding",
          threshold = 0.4, bands = 6, bitsPerBand = bits, md5Planes = true)
          .agg(count(lit(1)).as("n_pairs"),
            sum(round(col("sim") * 1000000).cast("long")).as("sim_mass_micro"))
      },
      knob = "bitsPerBand = autoBitsPerBand(n) = max(3, ceil(log2(n/64))) — grows with log2 n so expected bucket size stays ~64; output is the pair-count summary (pair LIST mass at threshold 0.4 is corpus geometry, ~n^2 coincidence tail in 64 dims)"))

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

  private def timedMeasure(spark: SparkSession, dir: String, f: Family):
      (ShuffleAudit.Volumes, Double) = {
    // ingest-side signal builds land OUTSIDE the measured window (see
    // Family.warm) — memoized, so a family that already paid them in a
    // full run is unaffected
    f.warm.foreach(_(spark, dir))
    val t0 = System.nanoTime()
    // measureTotal (listener-window accounting), NOT the executed-plan
    // walk: families that eagerly localCheckpoint during CONSTRUCTION
    // (triangles per-node, label-prop rounds) run their heavy shuffles
    // before the returned frame ever executes, so the plan walk saw
    // only the final scan/orderBy — vacuous exactly for the
    // quadratic-risk internals this probe exists to check (r11 showed
    // graph_triangles at 3 KB of "shuffle"). The probe runs families
    // serially on an idle session, the listener's required scope.
    val build = f.builder.getOrElse(graft.SparkEntry.queries(f.query))
    val v = ShuffleAudit.measureTotal(spark)(build(spark, dir))
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
      val (v1, w1) = timedMeasure(spark, dir1, f)
      val (vK, wK) = timedMeasure(spark, dirK, f)
      Obs(f.query, f.claim, f.coupled, k, v1.outputRows, vK.outputRows,
        v1.shuffleBytes, vK.shuffleBytes, v1.shuffleRows, vK.shuffleRows, w1, wK,
        f.knob)
    }

  def json(obs: Seq[Obs], sfDir: String, margin: Double): String = {
    val rows = obs.map { o =>
      val knobField =
        if (o.knob.isEmpty) "" else s""""knob":${JsonText.str(o.knob)},"""
      f"""{"query":${JsonText.str(o.query)},"claim":${JsonText.str(o.claim)},"coupled":${o.coupled},"k":${o.k},""" +
        knobField +
        f""""rows":[${o.rows1},${o.rowsK}],"shuffle_bytes":[${o.bytes1},${o.bytesK}],""" +
        f""""shuffle_rows":[${o.srows1},${o.srowsK}],""" +
        f""""wall_s":[${o.wall1}%.3f,${o.wallK}%.3f],""" +
        f""""bytes_ratio":${if (o.bytesRatio.isInfinity) -1.0 else o.bytesRatio}%.2f,""" +
        f""""rows_ratio":${if (o.rowsRatio.isInfinity) -1.0 else o.rowsRatio}%.2f,""" +
        f""""linear_ok":${o.linearOk(margin)}}"""
    }.mkString("[", ",", "]")
    s"""{"probe":"inflation","sf":"$sfDir","margin":$margin,""" +
      s""""note":"linear_ok: kx growth of shuffle bytes/rows and output rows stays under margin*k plus a fixed-overhead floor; shuffle accounting is LISTENER-window (construction-time localCheckpoint shuffles and streaming micro-batch stages included); coupled=true families (query set derived from the corpus, so both join sides grow) get the KNOWN query-volume factor k on shuffle signals, i.e. PER-QUERY linearity; an empty 1x baseline fails; knob records any corpus-derived re-banding; wall_s advisory","families":$rows}"""
  }

  /** `runMain graft.tools.ScaleProbe [sfDir] [k] [outPath] [sel]` —
    * the optional 4th arg is either the literal `banded` (the
    * derived-knob [[bandedFamilies]] set, VERDICT r11 ask #2) or a
    * comma-separated family subset (e.g. a deep k=100 run over the
    * cheap strictly-linear families; the full set at k=100 would spend
    * minutes proving the coupled self-joins quadratic, which k=10
    * already shows). */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val outPath = args.lift(2).getOrElse("SCALE_r12.json")
    val sel = args.lift(3)
    val spark = graft.sources.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val dir1 = inflateTo(spark, sfDir, 1)
    val dirK = inflateTo(spark, sfDir, k)
    val only = sel.filter(_ != "banded")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val families =
      if (sel.contains("banded")) bandedFamilies
      else (batchFamilies ++ streamedFamilies)
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
