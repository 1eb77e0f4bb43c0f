package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** HOT-TILE skew probe for the passage-dedup family (VERDICT r18 ask
  * #1): `passageDedup` / `passageRewrite` compute one corpus-wide
  * occurrence count keyed by the passage TEXT, and the C4 paper's
  * motivating corpus has a boilerplate tile (cookie banner, nav chrome)
  * occurring 10⁸–10⁹ times at 100 TB — every occurrence funneling into
  * whatever task owns that key. The generic [[SkewProbe]] measures the
  * hot-KEY laws on events; this probe injects a hot TILE into the real
  * documents corpus and measures the passage family's own shapes:
  *
  *  1. `passage_window_hot` — the r18 shipped shape (`count(1) over
  *     Window.partitionBy(passage)`), run WITH AQE skew handling fully
  *     enabled: the negative receipt. AQE's OptimizeSkewedJoin splits
  *     join partitions only; NOTHING at runtime can split a window
  *     partition, so the hot tile sorts+buffers on one task no matter
  *     the config. This is why r19 removed the shape from the shipped
  *     operators.
  *  2. `passage_join_plain` — the r19 join-back shape ([[Dedup
  *     .withPassageOcc]] with the split disabled, `hotTileOcc = 0`:
  *     map-combined `groupBy(passage).count` + equi-join back) with
  *     AQE off: the count side is skew-immune by plan shape (partials
  *     collapse map-side), but the join-back probe side still
  *     concentrates the hot tile on one task — the hazard is still
  *     manifest without the broadcast split, measured honestly.
  *  3. `passage_join_aqe` — the same split-disabled shape under AQE
  *     skew-join (thresholds calibrated to the measured hot partition,
  *     as the cluster's 256 MB defaults are to real partitions): the
  *     SECOND negative receipt, and the reason the broadcast split is
  *     on by default. AQE cannot rescue this join for two independent
  *     reasons: OptimizeSkewedJoin's pattern needs a bare shuffle
  *     stage under each join side and the count side is HashAggregate-
  *     over-stage (an explicit repartition gets elided as redundant —
  *     the agg's partitioning already satisfies it); and its skew
  *     detection reads COMPRESSED map sizes, which a byte-identical
  *     hot tile shrinks to statistical invisibility.
  *  4. `passage_hotsplit` — the shipped mitigation (`hotTileOcc`
  *     heavy-hitter broadcast split, on by default in the operators):
  *     tiles at/above the threshold resolve via BROADCAST join and
  *     never shuffle at all; the light remainder is bounded per key by
  *     construction. Run with AQE off to show the mitigation needs no
  *     runtime help. Losslessness of the heavy/light split is
  *     separately oracle-gated (`dedup_passages_hotsplit`).
  *
  * All four arms compute the identical per-doc relation, rolled up to a
  * 10-segment checksum and asserted row-equal — mitigation must never
  * change semantics. [[graft.PassageSkewSpec]] asserts the laws in CI
  * at sf0.001; `main` writes the round artifact.
  */
object PassageSkewProbe {

  /** Exactly `passageTokens` distinctive tokens — disjoint from real
    * corpus text AND from [[Inflate.saltText]]'s per-copy salt tokens,
    * so the injected tile is ONE corpus-wide hot key. The tokens are
    * LONG (24 chars — realistic for legal-banner boilerplate) on
    * purpose: AQE's skew detection keys on partition BYTES, and a
    * byte-light hot tile would test the detector's threshold rather
    * than the split's effect. */
  def boilerplate(passageTokens: Int): String =
    (0 until passageTokens).map(i => s"bplt$i".padTo(24, 'x')).mkString(" ")

  /** The inflated documents corpus with `repeats` boilerplate tiles
    * prepended to a `hotMicro`-microfraction of docs (deterministic on
    * doc_id, reproducible run-to-run). Prepending whole tiles keeps the
    * 10-token tiling of the original text ALIGNED: every selected doc
    * contributes `repeats` hot-tile rows plus its original tiles
    * unchanged. */
  def skewedDocs(spark: SparkSession, dir: String, k: Int, hotMicro: Long,
      passageTokens: Int, repeats: Int): DataFrame = {
    val prefix = (boilerplate(passageTokens) + " ") * repeats
    Inflate.table(spark, dir, "documents", k)
      .withColumn("text",
        when(pmod(xxhash64(col("doc_id")), lit(1000000L)) < lit(hotMicro),
          concat(lit(prefix), col("text"))).otherwise(col("text")))
  }

  /** The relation every arm must agree on — [[Dedup.passageDedup]]'s
    * per-doc output, rolled up to a 10-segment order-insensitive
    * checksum (modded so the ANSI sum cannot overflow). */
  def rollup(perDoc: DataFrame): DataFrame =
    perDoc.groupBy(pmod(col("doc_id"), lit(10L)).as("segment"))
      .agg(count(lit(1)).as("n_rows"),
        sum(pmod(xxhash64(concat_ws(",", col("doc_id"), col("n_passages"),
          col("n_dup_passages"), col("n_tokens"), col("n_kept_tokens"))),
          lit(1L << 40))).as("value_micro"))
      .orderBy(col("segment"))

  /** The r18 shape, inline (it no longer exists in shipped code): the
    * occurrence count as a count window over the passage key, then the
    * identical per-doc rollup as [[Dedup.passageDedup]]. */
  def windowForm(docs: DataFrame, passageTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Dedup.passageTiles(docs, "doc_id", "text", passageTokens)
    val occ = p.withColumn("n_occ",
      count(lit(1)).over(Window.partitionBy(col("passage"))))
    occ.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_passages"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_passages"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("n_occ") === 1, col("n_toks")).otherwise(0L)).as("n_kept_tokens"))
      .withColumn("dup_share",
        round(col("n_dup_passages").cast("double") / col("n_passages"), 6))
  }

  final case class Probe(k: Int, hotMicro: Long, repeats: Int,
      injectedShare: Double, hotTileOcc: Long, arms: Seq[SkewProbe.Arm])

  def run(spark: SparkSession, sfDir: String, k: Int, hotMicro: Long,
      passageTokens: Int = 10, repeats: Int = 6): Probe = {
    val docs = skewedDocs(spark, sfDir, k, hotMicro, passageTokens, repeats)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tiles = Dedup.passageTiles(docs, "doc_id", "text", passageTokens)
      val totalTiles = tiles.count()
      val hotRows = tiles
        .filter(col("passage") === boilerplate(passageTokens)).count()
      val injected = hotRows.toDouble / totalTiles
      // the broadcast threshold a deployment would read off hotPassages:
      // well above organic duplication, well below the injected tile
      val hotOcc = math.max(2L, hotRows / 2)

      // negative receipt first: the r18 window shape under FULL AQE
      // skew handling (thresholds calibrated from the hot tile's row
      // count at a conservative 64 B/row estimate — the exact value is
      // irrelevant: no AQE rule can split a window partition at ANY
      // threshold)
      val windowHot = SkewProbe.runArm(spark, "passage_window_hot",
        "r18 shape: count(1) over Window.partitionBy(passage) with AQE skew handling ON — window partitions are not splittable at runtime, hot tile sorts on ONE task",
        SkewProbe.aqeConfs(64L * hotRows / 3, 64L * hotRows / 6)) {
        rollup(windowForm(docs, passageTokens))
      }

      val plain = SkewProbe.runArm(spark, "passage_join_plain",
        "r19 join-back with the broadcast split DISABLED (hotTileOcc=0), AQE off: map-combined groupBy(passage).count (immune) + join-back whose probe side still concentrates — the positive control",
        SkewProbe.plainConfs) {
        rollup(Dedup.passageDedup(docs, "doc_id", "text", passageTokens,
          hotTileOcc = 0L))
      }
      val hotBytes = plain.worstStage.map(_.maxTaskBytes).getOrElse(64L << 10)
      val (thr, adv) = SkewProbe.aqeKnobs(hotBytes)

      val arms = Seq(windowHot, plain,
        SkewProbe.runArm(spark, "passage_join_aqe",
          s"split-disabled join-back under AQE skew-join (threshold=$thr advisory=$adv): NEGATIVE receipt — OptimizeSkewedJoin cannot match an agg-fed build side, and compressed map stats cannot see a byte-identical hot tile; this is why hotTileOcc is on by default",
          SkewProbe.aqeConfs(thr, adv)) {
          rollup(Dedup.passageDedup(docs, "doc_id", "text", passageTokens,
            hotTileOcc = 0L))
        },
        SkewProbe.runArm(spark, "passage_hotsplit",
          s"the SHIPPED mitigation: hotTileOcc=$hotOcc heavy-hitter broadcast split (operators default 10000), AQE off: tiles >= threshold never shuffle; light remainder bounded per key by construction",
          SkewProbe.plainConfs) {
          rollup(Dedup.passageDedup(docs, "doc_id", "text", passageTokens,
            hotTileOcc = hotOcc))
        })
      Probe(k, hotMicro, repeats, injected, hotOcc, arms)
    } finally { docs.unpersist(false): Unit }
  }

  def json(p: Probe, sfDir: String): String = {
    val armRows = p.arms.map { a =>
      val ws = a.worstStage.map(s =>
        s""""worst_stage":{"tasks":${s.tasks},"max_task_rows":${s.maxTaskRows},""" +
          s""""total_rows":${s.totalRows},"max_task_bytes":${s.maxTaskBytes},""" +
          s""""total_bytes":${s.totalBytes}},""").getOrElse("")
      f"""{"arm":${JsonText.str(a.name)},"note":${JsonText.str(a.note)},$ws""" +
        f""""worst_share_rows":${a.worstShareRows}%.4f,""" +
        f""""worst_share_bytes":${a.worstShareBytes}%.4f,""" +
        f""""wall_s":${a.wall}%.3f,"result_rows":${a.result.size}}"""
    }.mkString("[", ",", "]")
    val byName = p.arms.map(a => a.name -> a).toMap
    val win = byName("passage_window_hot")
    val plain = byName("passage_join_plain")
    val laws =
      s""""window_unsplittable_even_with_aqe":${win.worstShareRows >= 0.5 * p.injectedShare},""" +
        s""""hazard_manifest_without_split":${plain.worstShareRows >= 0.5 * p.injectedShare},""" +
        s""""aqe_cannot_rescue_join_back":${byName("passage_join_aqe").worstShareRows >= 0.5 * p.injectedShare},""" +
        s""""hotsplit_mitigates_without_aqe":${byName("passage_hotsplit").worstShareRows <= win.worstShareRows / 2},""" +
        s""""hotsplit_beats_plain":${byName("passage_hotsplit").worstShareRows <= plain.worstShareRows / 2},""" +
        s""""arms_row_equal":${p.arms.map(_.result).distinct.size == 1}"""
    f"""{"probe":"passage_skew","sf":"$sfDir","k":${p.k},"hot_micro":${p.hotMicro},""" +
      f""""boilerplate_repeats":${p.repeats},"injected_tile_share":${p.injectedShare}%.4f,""" +
      f""""hot_tile_occ_threshold":${p.hotTileOcc},""" +
      s""""note":"hot boilerplate TILE injected into the real documents corpus; per-task shuffle-read concentration per arm (worst qualifying stage max-task/total). THREE negative receipts (window unsplittable; join-back concentrated; AQE blind to it both structurally and statistically) and one positive: the hotTileOcc heavy-hitter broadcast split — on by default in the shipped operators — removes the hot key from the shuffle entirely. All arms row-equal by law.","laws":{$laws},"arms":$armRows}"""
  }

  /** `runMain graft.tools.PassageSkewProbe [sfDir] [k] [hotMicro] [outPath]` */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val hotMicro = args.lift(2).map(_.toLong).getOrElse(500000L)
    val outPath = args.lift(3).getOrElse("SCALE_r19_passage_skew.json")
    val spark = graft.sources.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val p = run(spark, sfDir, k, hotMicro)
    val out = json(p, sfDir)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (out + "\n").getBytes("UTF-8"))
    p.arms.foreach(a => println(
      f"[passage-skew] ${a.name}%-22s worst_share rows=${a.worstShareRows}%.3f " +
        f"bytes=${a.worstShareBytes}%.3f wall=${a.wall}%5.2f s"))
    println(s"[passage-skew] injected_tile_share=${p.injectedShare} " +
      s"hotTileOcc=${p.hotTileOcc}; artifact written to $outPath")
    spark.stop()
  }
}
