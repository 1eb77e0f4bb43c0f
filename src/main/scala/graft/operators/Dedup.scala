package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for the training-data-pipeline extension:
  * exact (hash-groupBy), MinHash+LSH, SimHash, and exact n-gram Jaccard
  * with blocking. All are pure DataFrame compositions — each stage is one
  * shuffle on an explicit key, so the plans scale to 100 TB:
  *
  *  - exact: one hash-agg shuffle on the fingerprint.
  *  - minhash: per-doc signature is computed scan-side (no shuffle);
  *    candidate generation shuffles once on (band, band_hash); the verify
  *    join shuffles candidates (tiny vs corpus) back to shingle sets.
  *  - simhash: same banding pattern over 16-bit sub-keys of the 64-bit
  *    signature (hamming ≤ d neighbors share a band for d < bands).
  *
  * Hash choice is parameterized: md5-string hashing is bit-identical in
  * every engine (DuckDB-oracle-able); xxhash64 is the fast path (codegen,
  * no hex-string materialization) with identical structure.
  */
object Dedup {

  /** Exact dedup via fingerprint group: deterministic survivor (min id)
    * instead of `dropDuplicates`' arbitrary-row semantics. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** The shared tiling of the passage family: documents cut into
    * non-overlapping `passageTokens`-token windows, one row per tile —
    * (doc_id, start, passage, n_toks). Pure scan-side (tokenize +
    * explode), no shuffle. */
  private[graft] def passageTiles(df: DataFrame, idCol: String, textCol: String,
      passageTokens: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), greatest(size(col("w")) - 1, lit(0)),
          lit(passageTokens))).as("start"))
      .select(col("doc_id"), col("start"),
        concat_ws(" ", slice(col("w"), col("start") + 1, lit(passageTokens))).as("passage"),
        size(slice(col("w"), col("start") + 1, lit(passageTokens))).cast("long").as("n_toks"))

  /** Corpus-wide occurrence count per tile, joined back onto the tile
    * rows as `n_occ`. The r18 form was `count(1) over
    * Window.partitionBy(passage)` — one shuffle, but a STRAGGLER trap
    * the r18 verdict flagged and `PassageSkewProbe` now measures: a
    * corpus-hot boilerplate tile (the C4 paper's motivating case —
    * cookie banners, nav chrome) funnels every occurrence into ONE
    * WindowExec partition that sorts and buffers them on a single task,
    * and no runtime mitigation can split a window partition. This form
    * replaces it with `groupBy(passage).count` + an equi-join back:
    *
    *  - the count agg is map-side combined — the hot tile collapses to
    *    one partial per map task BEFORE its shuffle, so the count side
    *    is skew-immune by plan shape (the `agg_partial` law);
    *  - the join-back probe side is a streaming hash/merge probe — no
    *    sort buffer over the hot partition, unlike WindowExec.
    *
    * The join-back alone does NOT remove the straggler, and
    * `PassageSkewProbe` measured exactly why runtime mitigation cannot
    * be relied on either — two independent negative receipts:
    * OptimizeSkewedJoin's pattern needs a BARE shuffle stage under each
    * join side, and the count side is HashAggregate-over-stage (an
    * explicit repartition to fix that is elided as redundant, since the
    * agg's output partitioning already satisfies it); and even where
    * the pattern matched, AQE's skew detection reads COMPRESSED map
    * output sizes, and a hot tile of byte-identical text compresses to
    * nearly nothing — statistically invisible. So:
    *
    * `hotOcc > 0` (the DEFAULT — see [[passageDedup]]) is the
    * load-bearing, AQE-independent mitigation: tiles with >= hotOcc
    * occurrences (at most total/hotOcc keys — a bounded, broadcastable
    * set) resolve via BROADCAST join and never shuffle at all; the
    * light remainder — every key now < hotOcc occurrences, so bounded
    * per-task BY CONSTRUCTION — takes the shuffled join. The split is a
    * partition of the key space, so the union is row-equal to the plain
    * join (oracle-gated by `dedup_passages_hotsplit`; task shares
    * measured by `PassageSkewProbe`). */
  private[graft] def withPassageOcc(p: DataFrame, hotOcc: Long): DataFrame = {
    val cnt = p.groupBy(col("passage")).agg(count(lit(1)).as("n_occ"))
    if (hotOcc <= 0L) p.join(cnt, Seq("passage"))
    else {
      // identical agg subplans below reuse one exchange (ReusedExchange)
      val heavy = cnt.filter(col("n_occ") >= hotOcc)
      val light = cnt.filter(col("n_occ") < hotOcc)
      // BOTH broadcasts are the identical `heavy` plan on purpose: the
      // anti join only consumes the passage key (the extra 8-byte n_occ
      // rides along), and identical plans make the two broadcast
      // exchanges a single ReusedExchange — projecting the anti side to
      // passage-only would build and ship the heavy set twice
      val hot = p.join(broadcast(heavy), Seq("passage"), "inner")
      val rest = p
        .join(broadcast(heavy), Seq("passage"), "left_anti")
        .join(light, Seq("passage"), "inner")
      hot.unionByName(rest)
    }
  }

  /** Passage-level exact substring dedup (the exact-substring member of
    * the dedup family at fixed passage granularity, cf. the dedup
    * literature's suffix-array formulation): documents are cut into
    * non-overlapping `passageTokens`-token windows, and a passage whose
    * text occurs more than once corpus-wide is duplicated content. Emits
    * per doc: passage/duplicate counts, total tokens, and the token
    * count that survives dropping every duplicated passage.
    *
    * Scale: the passage explode is scan-side; the corpus-wide occurrence
    * count is a map-combined `groupBy(passage).count` joined back onto
    * the tiles ([[withPassageOcc]] — r19, replacing the r18 count
    * window whose hot-tile straggler `PassageSkewProbe` measured); the
    * per-doc rollup is the final shuffle. A boilerplate passage shared
    * by millions of docs never pair-explodes, collapses map-side in the
    * count, and bypasses the join-back shuffle entirely once it crosses
    * `hotTileOcc`.
    *
    * `hotTileOcc` defaults to 10000: any tile above 10k occurrences
    * resolves via the broadcast path (the heavy set is at most
    * tiles/10k keys — e.g. ~10M rows per 10¹¹ tiles, and in practice
    * boilerplate is far rarer), and every shuffled join key is bounded
    * at 10k rows BY CONSTRUCTION — no data distribution can straggle
    * it. Tune it against [[hotPassages]]'s mining output; 0 disables
    * the split (the plain join the probe's control arms measure). */
  def passageDedup(df: DataFrame, idCol: String, textCol: String,
      passageTokens: Int = 10, hotTileOcc: Long = 10000L): DataFrame = {
    val p = passageTiles(df, idCol, textCol, passageTokens)
    val occ = withPassageOcc(p, hotTileOcc)
    occ.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_passages"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_passages"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("n_occ") === 1, col("n_toks")).otherwise(0L)).as("n_kept_tokens"))
      .withColumn("dup_share",
        round(col("n_dup_passages").cast("double") / col("n_passages"), 6))
  }

  /** The REWRITE half of passage dedup (r18): [[passageDedup]] reports
    * duplication statistics; this EMITS the cleaned document — every
    * tile whose exact text occurs more than `maxOcc` times corpus-wide
    * is dropped and the survivors are reassembled in document order,
    * the C4-style "discard any span seen elsewhere" pass
    * (Raffel et al. 2020, arXiv:1910.10683 §2.2 does it at
    * three-sentence granularity; these corpora have no sentence
    * boundaries, so the unit is the same `passageTokens` tile as the
    * statistics pass). Output per doc: (doc_id, n_passages, n_kept,
    * clean_text, clean_md5) — clean_text IS the rewritten corpus column
    * a production C4 pass feeds downstream (r19, VERDICT r18 ask #4;
    * the r18 form emitted only the fingerprint), and clean_md5 stays
    * the oracle-compared fingerprint of the space-joined surviving
    * tiles (a fully-duplicated doc keeps its row, with clean_text ''
    * and md5('')). `md5(clean_text) == clean_md5` is a DedupSpec law.
    *
    * Scale: identical tiling, map-combined occurrence count and
    * default-on heavy-hitter broadcast split as [[passageDedup]]
    * ([[withPassageOcc]] — r19, replacing the r18 count window whose
    * hot-tile straggler `PassageSkewProbe` measured; same `hotTileOcc`
    * contract); the reassembly adds one doc-keyed aggregate whose collected payload is the document itself
    * (array_sort by the unique tile start makes the join order a pure
    * function of the data, never of partition arrival). */
  def passageRewrite(df: DataFrame, idCol: String, textCol: String,
      passageTokens: Int = 10, maxOcc: Long = 1L,
      hotTileOcc: Long = 10000L): DataFrame = {
    val p = passageTiles(df, idCol, textCol, passageTokens)
      .drop("n_toks")
    val occ = withPassageOcc(p, hotTileOcc)
    occ.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_passages"),
        sum(when(col("n_occ") <= maxOcc, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(col("start"),
                (col("n_occ") <= maxOcc).as("keep"), col("passage")))),
              s => s.getField("keep")),
            s => s.getField("passage")),
          " ").as("clean_text"))
      .withColumn("clean_md5", md5(col("clean_text")))
  }

  /** Boilerplate mining over the passage tiling: every tile occurring
    * >= `minOcc` times corpus-wide, with its occurrence count and the
    * smallest doc carrying it (min — map-combined, so the aggregate
    * stays skew-immune; a distinct-doc count would re-shuffle the hot
    * tile's full doc list). This is the table [[withPassageOcc]]'s
    * `hotOcc` threshold is tuned against — run it first, read the top
    * occurrence counts, pick the broadcast cut. One map-combined
    * groupBy(passage) aggregate: the hot tile collapses to one partial
    * per map task, so the mining pass itself cannot straggle. */
  def hotPassages(df: DataFrame, idCol: String, textCol: String,
      passageTokens: Int = 10, minOcc: Long = 2L): DataFrame =
    passageTiles(df, idCol, textCol, passageTokens)
      .groupBy(col("passage"))
      .agg(count(lit(1)).as("n_occ"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_occ") >= minOcc)

  /** INGEST-time passage contamination screen — the C4-style question
    * asked of each ARRIVING document before it joins the corpus: what
    * share of its tiles already exists in the standing corpus? (A doc
    * that is mostly standing boilerplate/duplication is a drop or
    * down-weight candidate at ingest, BEFORE it inflates the corpus the
    * next full [[passageDedup]] pass runs on.) Output per arriving doc:
    * (doc_id, n_tiles, n_contam, contam_share).
    *
    * Works unchanged on a BATCH arriving frame or a STREAMING one
    * (every op here is stream-legal: the tiling is a projection, the
    * history join is stream-static, the rollup is an update-mode
    * aggregate); `dedup_passage_screen` / `dedup_passage_screen_streamed`
    * gate both forms against one oracle, so stream == batch == external
    * engine.
    *
    * Scale: the history side is `historyCounts` — pass the PERSISTED
    * per-passage count table (one [[hotPassages]]-shaped map-combined
    * aggregate, maintained at corpus build time, NOT recomputed per
    * ingest batch). The probe side is batch-sized; the join keys on the
    * tile text like [[withPassageOcc]], and the same hot-tile reasoning
    * applies — at 100 TB pre-split `historyCounts` at its own
    * `hotTileOcc` boundary and broadcast the heavy subset (bounded at
    * tiles/threshold keys), leaving the shuffled remainder bounded per
    * key; an arriving batch is small enough that in the common case the
    * whole screen is one broadcast of the batch's tile set instead. */
  def passageScreen(arriving: DataFrame, historyCounts: DataFrame,
      idCol: String, textCol: String, passageTokens: Int = 10): DataFrame =
    passageTiles(arriving, idCol, textCol, passageTokens)
      .join(historyCounts.select(col("passage"), col("n_occ").as("n_hist_occ")),
        Seq("passage"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tiles"),
        sum(when(col("n_hist_occ").isNotNull, 1L).otherwise(0L)).as("n_contam"))
      .withColumn("contam_share",
        round(col("n_contam").cast("double") / col("n_tiles"), 6))

  /** Sliding-window exact substring dedup (Lee et al. 2022,
    * arXiv:2107.06499 — the ExactSubstr pass at k-token granularity
    * rather than a suffix array): every POSITIONAL k-gram — unlike
    * [[passageDedup]]'s disjoint tiles, so a copy straddling a tile
    * boundary is still caught — whose hash occurs ≥ `minOcc` times
    * corpus-wide marks its [pos, pos+k) token span; per doc the marked
    * spans merge by interval union (gaps-and-islands: both window
    * passes share ONE doc-keyed partitioning) into maximal duplicated
    * spans. Adjacent-but-disjoint spans stay separate (merge on
    * overlap only).
    *
    * Scale: the gram pass is scan-side and emits (doc_id, pos, hash)
    * ids only — text never shuffles; the ≥ minOcc filter is one
    * map-combined hash agg; the span algebra is per-doc. A boilerplate
    * gram shared by millions of docs grows one hash partition
    * linearly in its occurrences, never pairwise. */
  def substringSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minOcc: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tokenize ONCE per row into a bound column: an inline tokens()
    // expression inside the HOF lambda below would re-split the text
    // per array ELEMENT — O(tokens²) per doc (the postingRows lesson)
    val docs = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val grams = when(size(col("toks")) >= k,
        transform(sequence(lit(0), size(col("toks")) - k),
          i => md5(concat_ws(" ", slice(col("toks"), i + lit(1), lit(k))))))
      .otherwise(array().cast("array<string>"))
    // the gram pass (tokenize + per-position md5) dominates the cost
    // and feeds BOTH the ≥minOcc aggregate and the join probe — persist
    // it so the corpus is hashed once, not twice (Bench's
    // clearCache-between-queries drops it afterwards)
    val occ = docs.select(col("doc_id"), posexplode(grams).as(Seq("pos", "h")))
      .persist()
    // registry-tracked (r13, r15 semantics): the pin must outlive this
    // call (the returned plan consumes occ twice, lazily), so it cannot
    // unpersist here — the registry keys on the canonicalized plan, so
    // identical re-invocations share ONE cache entry, released at
    // evict/application end
    PinRegistry.replace("dedup.substringSpans", Seq(occ))
    val dupH = occ.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minOcc).select(col("h"))
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = occ.join(dupH, Seq("h"))
      .withColumn("prev_max_end", max(col("pos") + lit(k)).over(wPrev))
      .withColumn("new_span",
        when(col("prev_max_end").isNull || col("pos") >= col("prev_max_end"), 1L)
          .otherwise(0L))
      .withColumn("span_id", sum(col("new_span")).over(wRun))
      .groupBy(col("doc_id"), col("span_id"))
      .agg((max(col("pos") + lit(k)) - min(col("pos"))).as("span_len"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_len")).cast("long").as("dup_tokens"))
    docs.select(col("doc_id"), size(col("toks")).cast("long").as("total_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("total_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("total_tokens").cast("double"), 6).as("dup_ratio"))
  }

  /** MinHash signature as an array column: sig(i) = min over shingles of
    * hash(i, shingle). Fused custom expression — one pass over the
    * shingle array updating all perm minimums (the HOF reference
    * formulation below runs numHashes interpreted passes). */
  def minhashSignatureMd5(shinglesCol: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graft.ExprBridge
    ExprBridge.column(graft.expressions.MinHashSignatureMd5(
      ExprBridge.expression(shinglesCol), numHashes))
  }

  def minhashSignatureMd5Hof(shinglesCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shinglesCol, s => md5(concat(i.cast("string"), lit("|"), s)))))

  def minhashSignatureFast(shinglesCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shinglesCol, s => xxhash64(i, s))))

  /** One (id, band, bh) row per document per band — the banded
    * SIGNATURE INDEX rows [[lshCandidates]] buckets and
    * [[incrementalNearDupComponents]] probes. Shared so the batch and
    * incremental paths can never disagree on the band-hash encoding. */
  def bandedRows(
      withSig: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int, useMd5: Boolean = true): DataFrame = {
    val bandHash = (b: Int) => {
      val sliceCol = slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand)
      if (useMd5) md5(concat_ws(",", sliceCol))
      else xxhash64(sliceCol).cast("string")
    }
    withSig.select(
      col(idCol),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandHash(b).as("bh"))): _*)).as("e"))
      .select(col(idCol).as("id"), col("e.band").as("band"), col("e.bh").as("bh"))
  }

  /** The per-doc shingle store (id, sh) — [[minhashNearDups]]' first
    * stage, exposed because a deployment PERSISTS it (it is the verify
    * side of every incremental probe). Empty-shingle docs are excluded,
    * matching the batch pipeline. */
  def shingleFrame(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame =
    df.select(col(idCol).as("id"), TextFunctions.shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)

  /** The persisted banded signature index (id, band, bh) for a corpus —
    * built once at ingest; [[incrementalNearDupComponents]] probes it
    * without touching the corpus texts again. At 100 TB this table is
    * written bucketed by (band, bh) so probe joins co-locate. */
  def bandedIndex(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4,
      useMd5: Boolean = true): DataFrame = {
    val sig = if (useMd5) minhashSignatureMd5(col("sh"), numHashes)
              else minhashSignatureFast(col("sh"), numHashes)
    bandedRows(shingleFrame(df, idCol, textCol, k).withColumn("sig", sig),
      "id", "sig", bands, numHashes / bands, useMd5)
  }

  /** [[bandedIndex]] collapsed to its PROBE layout — one row per
    * (band, bh) bucket with the member id list. This is the form a
    * deployment actually persists (the bucket-collect shuffle runs once
    * at ingest, not once per arriving batch), and the form
    * [[incrementalNearDupComponents]] consumes. */
  def bucketedIndex(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4,
      useMd5: Boolean = true): DataFrame =
    collectBuckets(bandedIndex(df, idCol, textCol, k, numHashes, bands, useMd5))

  /** Collapse [[bandedIndex]] rows to the probe layout — exposed so a
    * state writer that already persists the banded rows derives the
    * bucket form from THEM (one groupBy) instead of re-shingling the
    * corpus through [[bucketedIndex]]. */
  def collectBuckets(banded: DataFrame): DataFrame =
    banded.groupBy(col("band"), col("bh"))
      .agg(collect_list(col("id")).as("old_ids"))

  /** The shingle-store update shared by the probe
    * ([[incrementalNearDupComponents]]) and the chained state writer:
    * arriving ids' stale rows anti-joined out — keyed on the ARRIVING
    * ids, not the shingled ids, so a content-scrubbing re-ingest whose
    * new text has no k-grams still retires its old rows (the r12
    * re-ingest-safety law lives HERE, in one place) — then the batch's
    * fresh shingles unioned in. The id set is batch-sized → broadcast
    * at any corpus scale. */
  def updatedShingleStore(existingShingles: DataFrame, arriving: DataFrame,
      idCol: String, textCol: String, k: Int = 3): DataFrame =
    updatedShingleStore(existingShingles,
      arriving.select(col(idCol).cast("bigint").as("id")).distinct(),
      shingleFrame(arriving, idCol, textCol, k))

  /** [[updatedShingleStore]] over precomputed batch frames (the probe
    * already holds both and must not shingle the batch twice). */
  def updatedShingleStore(existingShingles: DataFrame, arrivingIds: DataFrame,
      arrivingShingles: DataFrame): DataFrame =
    existingShingles
      .join(broadcast(arrivingIds), Seq("id"), "left_anti")
      .unionByName(arrivingShingles)

  /** INDEX MAINTENANCE for the incremental path (r14) — the write half
    * of [[incrementalNearDupComponents]]'s probe-side stale scrubbing:
    * given the persisted id-keyed [[bandedIndex]] (the source of truth
    * a deployment keeps alongside the probe layout) and the persisted
    * [[bucketedIndex]], returns the `(banded', buckets')` pair the NEXT
    * ingest should persist. Arriving ids' OLD rows are retired
    * EVERYWHERE — including buckets the probe never touches, the
    * residue the probe-side scrub leaves by design — and the batch's
    * new band rows land in (or create) their buckets. A
    * content-scrubbing re-ingest (no k-grams) retires the id from the
    * whole index, same as a rebuild would.
    *
    * LAW (spec-pinned): both outputs equal rebuilding
    * [[bandedIndex]]/[[bucketedIndex]] from the replaced corpus
    * (existing minus arriving ids, plus the arriving batch), with
    * bucket member order unspecified.
    *
    * Cost shape at 100 TB: the stale and new row sets are ids-probes
    * keyed on the batch (broadcast-sized); bucket rewrites touch only
    * the affected (band, bh) keys via broadcast joins and per-bucket
    * array edits bounded by that bucket's size; every other bucket row
    * passes through verbatim with one anti-join. No full-index
    * re-collect — the one shuffle the probe layout exists to avoid. */
  def updatedBandedState(
      existingBanded: DataFrame, existingBuckets: DataFrame,
      arriving: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4,
      useMd5: Boolean = true): (DataFrame, DataFrame) = {
    val arIds = arriving.select(col(idCol).cast("bigint").as("id")).distinct()
    val arBanded = bandedIndex(arriving, idCol, textCol, k, numHashes, bands, useMd5)
    val stale = existingBanded.join(broadcast(arIds), Seq("id"), "left_semi")
    val newBanded = existingBanded
      .join(broadcast(arIds), Seq("id"), "left_anti")
      .unionByName(arBanded)
    // rewrite only the buckets a stale or new row names; starting from
    // the KEY set (not the old buckets) lets brand-new buckets appear
    val affectedKeys = stale.select(col("band"), col("bh"))
      .unionByName(arBanded.select(col("band"), col("bh"))).distinct()
    val staleSets = stale.groupBy(col("band"), col("bh"))
      .agg(collect_list(col("id")).as("stale_ids"))
    val addSets = arBanded.groupBy(col("band"), col("bh"))
      .agg(collect_list(col("id")).as("add_ids"))
    val empty = array().cast("array<bigint>")
    // reduce the corpus-scale index to the affected rows with a
    // broadcast SEMI join first: a direct `affectedKeys LEFT JOIN
    // existingBuckets` cannot broadcast its small (left) side — Spark
    // builds on the right of a left-outer join — so it would shuffle
    // the ENTIRE index on (band, bh) every ingest. The semi join is a
    // scan. affectedOld's ROW count is batch-bounded but its member
    // ARRAYS are bucket-sized — the index is uncapped, so a degenerate
    // boilerplate mega-bucket named by the batch can hold millions of
    // ids; it must stream executor-side, NEVER broadcast (a broadcast
    // collects it to the driver). The plain join below shuffles only
    // the batch-bounded affected rows. staleSets/addSets arrays are
    // subsets of the batch's ids — those broadcasts are safe.
    val affectedOld = existingBuckets
      .join(broadcast(affectedKeys), Seq("band", "bh"), "left_semi")
    val rewritten = affectedKeys
      .join(affectedOld, Seq("band", "bh"), "left")
      .join(broadcast(staleSets), Seq("band", "bh"), "left")
      .join(broadcast(addSets), Seq("band", "bh"), "left")
      .select(col("band"), col("bh"),
        array_union(
          array_except(coalesce(col("old_ids"), empty),
            coalesce(col("stale_ids"), empty)),
          coalesce(col("add_ids"), empty)).as("old_ids"))
      .filter(size(col("old_ids")) > 0)
    val untouched = existingBuckets
      .join(broadcast(affectedKeys), Seq("band", "bh"), "left_anti")
    (newBanded, untouched.unionByName(rewritten))
  }

  /** Bucket-local ordered pair explosion — ONE kernel shared by every
    * banded family (r15 review: the MinHash / SimHash / winnowing /
    * blocked-Jaccard paths each re-spelled it, so a pairing fix had to
    * land in four places or silently diverge candidate generation).
    * `idOf` extracts the id from an element reference; `payload` adds
    * per-pair struct fields (e.g. hamming, jaccard). */
  private def pairExplode(arrCol: String, idOf: String => String,
      payload: (String, String) => Seq[String] = (_, _) => Seq.empty): Column = {
    val (ei, ej) = (s"$arrCol[i]", s"$arrCol[j]")
    val extra = payload(ei, ej).map(",\n                " + _).mkString
    explode(expr(
      s"""flatten(transform(sequence(0, size($arrCol)-2),
         |  i -> transform(sequence(i+1, size($arrCol)-1),
         |    j -> struct(least(${idOf(ei)}, ${idOf(ej)}) AS id_a,
         |                greatest(${idOf(ei)}, ${idOf(ej)}) AS id_b$extra))))"""
        .stripMargin))
  }

  /** LSH banding: docs sharing any (band index, band hash) become
    * candidate pairs. One row per (doc, band); ONE shuffle groups rows
    * into buckets and pairs are exploded bucket-locally — no self-join,
    * so the (expensive) signature pipeline upstream is evaluated exactly
    * once. `maxBucket` guards degenerate buckets (skew at scale: a
    * boilerplate shingle set shared by millions of docs would otherwise
    * produce a quadratic bucket). */
  /** r20 (the SortedNeighborhood.candidatePairs pattern, shared by the
    * three bucket-collect call sites below): a bucket shuffle carries
    * FEW bytes (ids + a band/fingerprint key) but the size²/2 pair
    * explosion fuses into the stage above it, and AQE's byte-based
    * coalescing — blind to per-row CPU — collapsed those stages to a
    * handful of tasks on a 32-thread executor. An explicit
    * REPARTITION_BY_NUM pins the width (AQE does not coalesce
    * user-numbered repartitions); the groupBy reuses the partitioning,
    * so exchange count and results are unchanged. The count follows the
    * session's shuffle sizing — cluster deployments keep their own
    * derivation. */
  private def pinBucketWidth(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
      keys: _*)

  def lshCandidates(
      withSig: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int, maxBucket: Int = 1000,
      useMd5: Boolean = true): DataFrame = {
    val banded = bandedRows(withSig, idCol, sigCol, bands, rowsPerBand, useMd5)
    val buckets = pinBucketWidth(banded, col("band"), col("bh"))
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    // 0-based [] indexing; ids within a bucket are pair-exploded locally.
    buckets.select(pairExplode("ids", identity).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs against the distinct
    * shingle sets. Candidates are tiny relative to the corpus, so both
    * enrichment joins broadcast the pair list at scale. */
  def jaccardVerify(
      candidates: DataFrame, shingleSets: DataFrame,
      idCol: String, shCol: String, threshold: Double): DataFrame = {
    val a = shingleSets.select(col(idCol).as("id_a"), col(shCol).as("sh_a"))
    val b = shingleSets.select(col(idCol).as("id_b"), col(shCol).as("sh_b"))
    candidates.join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full MinHash+LSH near-dup pipeline over a text column. The shingle
    * frame feeds both the signature stage and the verify joins, so it is
    * persisted (memory-and-disk) rather than recomputed per consumer —
    * at scale, shingling + 16-perm hashing is the dominant scan cost. */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.8, useMd5: Boolean = true,
      maxBucket: Int = 1000): DataFrame = {
    val withSh = df.select(col(idCol), TextFunctions.shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // registry-tracked like substringSpans' gram pin: the shingle frame
    // feeds both the banding and the verify join of the LAZY result, so
    // it cannot unpersist here — identical re-invocations share one
    // registry-held cache entry (released at evict/application end)
    PinRegistry.replace("dedup.minhashNearDups", Seq(withSh))
    val sig = if (useMd5) minhashSignatureMd5(col("sh"), numHashes)
              else minhashSignatureFast(col("sh"), numHashes)
    val withSig = withSh.withColumn("sig", sig)
    val cands = lshCandidates(withSig, idCol, "sig", bands, numHashes / bands,
      maxBucket = maxBucket, useMd5 = useMd5)
    jaccardVerify(cands, withSh, idCol, "sh", threshold)
  }

  /** [[minhashNearDups]] under the [[autoBanding]]-chosen banding: the
    * closed planner loop for the MinHash family — evaluate the exact
    * S-curve at the target threshold, pick the floor-meeting banding
    * with the finest buckets, run it. Output is spec-pinned identical
    * to spelling the chosen banding out (the auto path changes WHICH
    * banding runs, never what a banding computes); at the registered
    * operating point the choice IS the registered 4×4. */
  def autoBandedNearDups(
      plan: DataFrame, df: DataFrame, idCol: String, textCol: String,
      threshold: Double, floorMicro: Long,
      k: Int = 3, numHashes: Int = 16, useMd5: Boolean = true,
      maxBucket: Int = 1000): DataFrame = {
    val sTenths = math.round(threshold * 10).toInt
    // the band plan measures recall on a TENTH grid — silently rounding
    // 0.75 to the 0.8 S-curve point would select a banding whose recall
    // floor holds at a HIGHER similarity than the one verified below
    // (recall is lower at 0.75), violating the caller's floor with no
    // error (r15 review)
    require(math.abs(threshold * 10 - sTenths) < 1e-9,
      s"threshold $threshold must sit on the band plan's tenth grid " +
        "(the S-curve is measured at s = 0.1k); interpolate the plan or " +
        "re-measure at the target similarity")
    val (bands, rows) = autoBanding(plan, sTenths, floorMicro)
    require(bands * rows == numHashes,
      s"plan banding ${bands}x$rows does not factor the $numHashes-hash signature")
    minhashNearDups(df, idCol, textCol, k, numHashes, bands, threshold, useMd5,
      maxBucket)
  }

  /** 64-bit SimHash of a token array: per-bit majority vote of token
    * hashes. Fused custom expression; `simhash64Hof` is the composable
    * reference (tests assert bit-equality). */
  def simhash64(tokensCol: Column): Column = {
    import org.apache.spark.sql.graft.ExprBridge
    ExprBridge.column(graft.expressions.SimHash64(ExprBridge.expression(tokensCol)))
  }

  /** md5-family SimHash (oracle-able cross-engine; see SimHash64Md5). */
  def simhash64Md5(tokensCol: Column): Column = {
    import org.apache.spark.sql.graft.ExprBridge
    ExprBridge.column(graft.expressions.SimHash64Md5(ExprBridge.expression(tokensCol)))
  }

  def simhash64Hof(tokensCol: Column): Column = {
    val counts = aggregate(
      tokensCol,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          j => when(call_function("shiftright", xxhash64(t), j).bitwiseAND(1) === 1,
            lit(1L)).otherwise(lit(-1L))),
        (a, b) => a + b))
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, j) => when(c > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup pairs: 16-bit band LSH then hamming ≤ maxHamming
    * verify (`bit_count(a xor b)`). For maxHamming < 4 the banding is
    * EXACT by pigeonhole (≤ 3 flipped bits cannot touch all 4 bands), so
    * as long as `maxBucket` doesn't bind, the result equals the
    * brute-force all-pairs hamming filter — which is what the md5-family
    * oracle computes. */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000,
      useMd5: Boolean = false): DataFrame = {
    val sigFn = if (useMd5) simhash64Md5 _ else simhash64 _
    val withSig = df.select(col(idCol).as("id"),
      sigFn(TextFunctions.tokens(col(textCol))).as("sig"))
    val banded = withSig.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b => struct(
        lit(b).as("band"),
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL).as("bh"))): _*)).as("e"))
      .select(col("id"), col("sig"), col("e.band").as("band"), col("e.bh").as("bh"))
    // Bucket-collect + local pair explosion: signatures computed once,
    // one shuffle, no self-join (same pattern as lshCandidates — but
    // WITHOUT the r20 pinned bucket width: measured 0.73 → 0.90 s at
    // sf0.1, a regression — these banded rows carry the 8-byte sig
    // payload and the hamming verify is cheap, so the explicit
    // repartition costs more than the wider explosion stage saves).
    val buckets = banded
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(struct(col("id"), col("sig"))).as("xs"))
      .filter(size(col("xs")).between(2, maxBucket))
    buckets.select(pairExplode("xs", e => s"$e.id",
        (i, j) => Seq(s"bit_count($i.sig ^ $j.sig) AS hamming")).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"), col("p.hamming").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Winnowing-based near-dup candidates: docs sharing at least
    * `minShared` winnowing fingerprints (position-robust — any
    * sufficiently long shared run yields shared fingerprints). One
    * shuffle on the fingerprint, bucket-collect pair explosion, then a
    * count-shared filter; compose with `jaccardVerify` for exact
    * confirmation. */
  def winnowingCandidates(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, window: Int, minShared: Int, maxBucket: Int = 1000): DataFrame = {
    // no pinned bucket width here (r20): measured FLAT at sf0.1 for
    // dedup_winnowing_candidates and slightly negative for the decontam
    // consumer — the fp stream is doc×fingerprints rows (much wider
    // than the banded LSH stream), so the explicit repartition's cost
    // cancels the wider explosion stage
    val fps = df.select(col(idCol).as("id"),
      explode(TextFunctions.winnowingFingerprints(col(textCol), k, window)).as("fp"))
    val buckets = fps.groupBy(col("fp"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    buckets.select(pairExplode("ids", identity).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .filter(col("n_shared_fps") >= minShared)
  }

  /** Winnowing near-dup pipeline: fingerprint candidates confirmed by
    * exact shingle Jaccard (candidates are tiny vs the corpus, so the
    * verify joins broadcast at scale). */
  def winnowingNearDups(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, window: Int = 4, minShared: Int = 5,
      threshold: Double = 0.8): DataFrame = {
    val cands = winnowingCandidates(df, idCol, textCol, k, window, minShared, maxBucket = 100)
      .select(col("id_a"), col("id_b"))
    val withSh = df.select(col(idCol), TextFunctions.shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
    jaccardVerify(cands, withSh, idCol, "sh", threshold)
  }

  /** Connected components over a near-dup pair list (id_a < id_b) —
    * the clustering step that turns pairwise matches into dedup GROUPS
    * so one survivor represents each transitive family.
    *
    * Strategy switch, same spirit as AQE's size-based broadcast
    * conversion: the edge list is counted once (it is persisted either
    * way — both strategies consume it), and
    *
    *  - ≤ `driverEdgeLimit` edges (default 1M — MEASURED, r15): a
    *    local union-find with path compression closes the components on
    *    the driver. The gate is no longer asserted: the
    *    ComponentsCrossover probe (SCALE_r15_components.json) timed both
    *    paths on identical edge sets across TWO topologies, and the
    *    crossover is topology-dependent. Flat graphs (diameter ≤ 2 —
    *    dense near-dup clusters): the min-label loop converges in ~3
    *    rounds at a ~2–3 s floor and overtakes the driver at ~0.4M
    *    edges (0.33M: driver 1.7 s vs 2.2 s; 0.67M: 4.4 s vs 2.5 s; 3.3M:
    *    20.3 s vs 4.0 s — driver collect + boxed-HashMap churn grows
    *    ~5–6 s/M while the loop stays flat). 1000-node chains: the loop
    *    pays ~log₂(diameter) extra rounds of fixed scheduling cost
    *    (~20–45 s) and the driver wins to ~7M (3.3M: 21.1 s vs 27.7 s).
    *    The 1M default is the regret-bounded compromise: a flat graph
    *    in the 0.4–1M band overpays ~3 s on the driver, while a chainy
    *    graph below 1M would overpay ~15 s if sent to the loop.
    *    Heap at the limit: ~0.1–0.25 GB transient (raw longs 16 MB;
    *    boxed HashMap and Rows dominate). High-diameter callers raise
    *    the limit explicitly; the distributed path is always correct.
    *    An LSH near-dup graph is SPARSE by construction (edges ≈
    *    surviving candidate pairs, bounded by the banding budget), so
    *    the driver path remains the common case at query scale; the
    *    distributed path is always correct.
    *  - above the limit: the iterative min-label-propagation loop below
    *    — every round one join + one group-by (data-parallel shuffles on
    *    node id) plus a pointer-jumping compression, converging in
    *    O(log diameter) rounds; the driver sees only a convergence
    *    scalar. The 100 TB path, unchanged.
    *
    * Output: (node, component) where component = min node id reachable.
    *
    * IMMUTABLE-INPUT assumption (r17 ADVICE #1): string-id inputs route
    * through [[surrogateMapping]], which memoizes the id→rank frame per
    * (session, canonical input PLAN) for the application lifetime. The
    * memo assumes a given plan always reads the same data — true for
    * the engine's query paths (each Verify/Bench invocation reads
    * immutable parquet snapshots). A caller that OVERWRITES a source
    * under a plan-identical input between calls must call
    * [[invalidateComponentIdMemo]] first, or ids absent from the stale
    * mapping are silently dropped by the inner join back to originals.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50,
      driverEdgeLimit: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    import org.apache.spark.storage.StorageLevel
    // Persist the edge list BEFORE symmetrizing: the union has two
    // branches over `pairs`, and an unpersisted input would evaluate its
    // whole upstream pipeline (e.g. an LSH candidate join) twice in one
    // plan — at sf0.1 embedding scale that doubled a million-candidate
    // explosion and OOM'd the executor heap.
    val p = pairs.select(col("id_a"), col("id_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // generic external-value ordering for the driver union-find (r15
    // review): ids are any orderable type — string doc ids reach this
    // operator through every candidate family, and the old
    // getAs[Number] crashed exactly when the corpus was SMALL enough
    // for the driver path while working at scale. None = an id type
    // the driver path doesn't handle; the distributed loop (correct
    // for any type) takes over regardless of edge count.
    import org.apache.spark.sql.types._
    val driverOrd: Option[Ordering[Any]] = p.schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(Ordering.by((v: Any) => v.asInstanceOf[Number].longValue()))
      case StringType => Some(Ordering.by((v: Any) => v.asInstanceOf[String]))
      case _ => None
    }
    if (driverOrd.isDefined && p.count() <= driverEdgeLimit) {
      val ord = driverOrd.get
      val edges = try p.collect().map(r => (r.get(0), r.get(1)))
      finally p.unpersist()
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ord.lt(ra, rb)) parent(rb) = ra
        else if (ord.lt(rb, ra)) parent(ra) = rb
      }
      // emit with the INPUT id type (r15 review: the driver arm used to
      // hardwire LongType, so the output schema flipped with edge count)
      val idType = p.schema.head.dataType
      val outRows = parent.keysIterator
        .map(n => org.apache.spark.sql.Row(n, find(n))).toSeq
      // LOCAL relation, not an RDD scan: a parallelize-backed frame has
      // no size statistics, so every downstream join against the
      // (tiny) component table lost its auto-broadcast and went
      // sort-merge — the PlanShapeSpec shuffle budget caught it
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(outRows.asJava,
        // nullable=true matches the distributed arm's join-derived
        // schema, so the two paths are schema-IDENTICAL, not just
        // type-identical
        StructType(Seq(StructField("node", idType, nullable = true),
          StructField("component", idType, nullable = true))))
    }
    // Non-numeric ids on the DISTRIBUTED path (r15 review): the
    // decimal-sum convergence probe needs numeric labels, so string ids
    // route through rank-ordered long SURROGATES — a distributed sortBy
    // + zipWithIndex (range-partitioned, never single-partition), loop
    // on longs, map back at the end. Rank order (not hash) keeps the
    // component representative = the min ORIGINAL id, exactly what the
    // driver arm and the docstring promise. Exotic id types fail loudly
    // up front instead of crashing mid-loop. The mapping is MEMOIZED per
    // (session, canonicalized input plan) — see [[surrogateMapping]].
    val surrogates: Option[DataFrame] = p.schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType => None
      case StringType => Some(surrogateMapping(spark, p))
      case t => throw new UnsupportedOperationException(
        s"connectedComponents: unsupported id type ${t.simpleString} " +
          "(numeric and string ids are supported)")
    }
    val edges = surrogates match {
      case None => p
      case Some(m) =>
        p.join(m.select(col("orig").as("id_a"), col("nid").as("nid_a")), "id_a")
          .join(m.select(col("orig").as("id_b"), col("nid").as("nid_b")), "id_b")
          .select(col("nid_a").as("id_a"), col("nid_b").as("id_b"))
    }
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Each iteration references `labels` twice (propagation join + the
    // convergence check), so the LOGICAL PLAN doubles per iteration —
    // persist() caches data but keeps the full lineage, and by ~20
    // iterations just rendering the plan tree OOMs the driver.
    // localCheckpoint (eager) truncates lineage each iteration: the plan
    // stays O(1) per step. (On a fault-tolerance-sensitive cluster the
    // same call site takes checkpoint() + setCheckpointDir.)
    // Seed labels with min(self, min neighbor): the first propagation
    // step fused into initialization — one groupBy replaces the distinct
    // AND saves a full join+groupBy iteration of the loop below.
    // Handle-exact hygiene ([[LocalCheckpoints]]): each iteration's
    // checkpoint supersedes the previous one, whose blocks are freed
    // once the new one is materialized — at most two label tables stay
    // pinned instead of one per iteration. The final labels checkpoint
    // remains pinned (the returned lazy frame reads it); node-sized.
    var (labels, labelRdds) = LocalCheckpoints.tracked(
      sym.groupBy(col("src").as("node"))
        .agg(min(col("dst")).as("min_nbr"))
        .select(col("node"), least(col("node"), col("min_nbr")).as("label")))
    // Convergence probe: labels are elementwise monotone non-increasing
    // (every update is a least(...) against the old label, and a node's
    // label never exceeds the node), so Σ label strictly decreases iff
    // ANY label changed — one shuffle-free aggregate over the freshly
    // checkpointed table replaces the old join+filter probe, cheap
    // enough to run EVERY iteration and exit at the earliest no-change.
    // decimal(38) keeps the sum exact for billions of 64-bit ids.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)")))
        .first().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    // failure hygiene (r15 review): an executor-lost/OOM inside any
    // labelSum action used to propagate out with p, sym, and the
    // current label checkpoint still pinned for the session lifetime
    try {
    while (!converged && i < maxIter) {
      val prop = sym.join(labels, sym("src") === labels("node"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr_label"))
      val hop = labels.join(prop, labels("node") === prop("dst"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // pointer jumping (path halving): label := label(label). One-hop
      // propagation alone needs diameter-many iterations — a 40-long
      // near-dup chain costs 40 job rounds of fixed scheduling overhead;
      // with compression convergence is logarithmic in the diameter.
      // (A second jump per round is NOT worth it: each jump references
      // its input twice, so chaining jumps on the unmaterialized hop
      // re-evaluates the join pipeline 4x — measured 3x slower than the
      // extra rounds it saves.)
      val (next, nextRdds) = LocalCheckpoints.tracked(hop.alias("a")
        .join(hop.select(col("node").as("l_node"), col("label").as("l_label")).alias("b"),
          col("a.label") === col("b.l_node"), "left")
        .select(col("a.node").as("node"),
          coalesce(col("b.l_label"), col("a.label")).as("label")))
      val curSum = labelSum(next)
      LocalCheckpoints.free(labelRdds) // superseded by the new checkpoint
      labels = next
      labelRdds = nextRdds
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      i += 1
    }
    } catch { case t: Throwable =>
      LocalCheckpoints.free(labelRdds) // no frame returned: free the last pin
      // the surrogate mapping is NOT unpersisted here: it is memoized per
      // input plan and stays valid for a retry (released at application
      // end by the memo's eviction listener)
      throw t
    } finally {
      sym.unpersist(): Unit
      p.unpersist(): Unit
    }
    surrogates match {
      case None => labels.select(col("node"), col("label").as("component"))
      case Some(m) =>
        // the mapping must stay pinned for this lazy plan's joins, so it
        // cannot unpersist here. Identical re-invocations genuinely share
        // ONE frame: [[surrogateMapping]] memoizes the RDD-backed build
        // per (session, canonicalized INPUT plan), so PinRegistry's
        // plan-keyed putIfAbsent sees the same canonical plan and stores
        // one handle — without the memo each string-id invocation built
        // a fresh zipWithIndex RDD (a distinct plan every call) and
        // pinned one node-sized cache per call until application end
        // (r15 ADVICE; refined r16 ADVICE #2)
        PinRegistry.replace("dedup.connectedComponents.surrogates", Seq(m))
        labels
          .join(m.select(col("nid").as("node"), col("orig").as("node_orig")), "node")
          .join(m.select(col("nid").as("label"), col("orig").as("component")), "label")
          .select(col("node_orig").as("node"), col("component"))
    }
  }

  /** String-id surrogate mapping memo (r16 ADVICE #2): the mapping is
    * RDD-backed (sortBy + zipWithIndex), so every rebuild canonicalizes
    * to a DISTINCT plan — without memoization, plan-identical inputs
    * each pinned a fresh node-sized cache entry until application end
    * (bench best-of-N re-invocations leaked one per sample). Keyed by
    * (session, semanticHash + canonical string of the ANALYZED input
    * plan) — the same collision-safe pair PinRegistry uses — a repeat
    * invocation returns the SAME frame object, so downstream plans are
    * plan-identical and PinRegistry's putIfAbsent stores one handle.
    * The mapping is a pure rank function of the distinct id set, so
    * reuse is semantics-exact. `spark.catalog.clearCache()` between
    * bench samples drops the cache entry but not the memo: a hit with
    * StorageLevel.NONE re-persists (re-computation is deterministic —
    * global rank is invariant to range-partition boundaries). Entries
    * are unpersisted and dropped by a per-session application-end
    * listener, mirroring PinRegistry's lifecycle. */
  private val surrogateMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), DataFrame]()
  private val surrogateEvictRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[
      org.apache.spark.sql.SparkSession]()

  private[graft] def surrogateMapping(spark: org.apache.spark.sql.SparkSession,
      p: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val c = p.queryExecution.analyzed.canonicalized
    val key = (spark, c.semanticHash().toString + ":" + c.toString)
    if (surrogateEvictRegistered.add(spark)) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          val it = surrogateMemo.entrySet().iterator()
          while (it.hasNext) {
            val en = it.next()
            if (en.getKey._1 eq spark) {
              try en.getValue.unpersist(blocking = false)
              catch { case scala.util.control.NonFatal(_) => () }
              it.remove()
            }
          }
          surrogateEvictRegistered.remove(spark): Unit
        }
      })
    }
    // Build OUTSIDE the map (r17 ADVICE #2): sortBy's range-partitioner
    // sampling and zipWithIndex both launch eager Spark jobs, and
    // computeIfAbsent runs its lambda under the CHM bin lock — a
    // concurrent caller whose key hashed to the same bin blocked for
    // the duration of a cluster job. get → build unlocked → putIfAbsent
    // instead: a lost race wastes one duplicate build (rare, bounded)
    // but never serializes unrelated callers behind a job.
    val m = {
      val hit = surrogateMemo.get(key)
      if (hit != null) hit
      else {
        import spark.implicits._
        val built = p.select(col("id_a").as("n"))
          .union(p.select(col("id_b").as("n")))
          .distinct().as[String].rdd
          .sortBy(identity).zipWithIndex()
          .toDF("orig", "nid")
        val prev = surrogateMemo.putIfAbsent(key, built)
        if (prev != null) prev else built
      }
    }
    if (m.storageLevel == StorageLevel.NONE) {
      m.persist(StorageLevel.MEMORY_AND_DISK)
      m.count(): Unit
    }
    m
  }

  /** Drop this session's memoized string-id surrogate mappings (r17
    * ADVICE #1). [[surrogateMapping]] is keyed by canonical input PLAN,
    * not data: if a plan-identical input's underlying bytes change
    * in-session (a source path overwritten between
    * [[connectedComponents]] calls), the stale mapping would be reused
    * and ids absent from it silently dropped by the inner join back.
    * Callers that mutate a component input in-session invalidate first
    * — mirroring `KafkaReplay.invalidateUnder`'s posture for replay
    * dirs. Unpersists and removes every entry for `spark`; the next
    * call rebuilds from current data. */
  def invalidateComponentIdMemo(spark: org.apache.spark.sql.SparkSession): Unit = {
    val it = surrogateMemo.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      if (en.getKey._1 eq spark) {
        try en.getValue.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () }
        it.remove()
      }
    }
  }

  /** INCREMENTAL near-dup maintenance — the ingest-batch path. At
    * 100 TB nothing re-shingles or re-bands the existing corpus per
    * batch: the deployment persists three tables at ingest — the
    * cluster state (`priorComp`, [[connectedComponents]] output), the
    * bucket-collected signature index (`existingBuckets`,
    * [[bucketedIndex]] output, written bucketed by (band, bh) so its
    * one collect shuffle runs at ingest, never per batch), and the
    * shingle store (`existingShingles`, [[shingleFrame]] output) — and
    * each arriving batch:
    *
    *  1. shingles + signs + bands ONLY the batch (map-side,
    *     batch-sized);
    *  2. probes the index: batch band rows join existing buckets on
    *     (band, bh) — with the index bucketed the probe shuffles batch
    *     rows only. Candidates = (new × old) + (new × new) within
    *     buckets whose UNION size obeys the same [2, maxBucket] guard
    *     as [[lshCandidates]];
    *  3. verifies candidates by exact Jaccard against the shingle
    *     stores (candidates are batch-bounded → broadcast);
    *  4. merges components on the CONTRACTED graph: each verified-edge
    *     endpoint maps to its prior component label (arriving and
    *     never-clustered docs label themselves), so the delta graph is
    *     bounded by the batch's matches, not the corpus. New labels
    *     then relabel prior members via one join against the
    *     node-sized cluster state — the "cluster merge" event
    *     DEPLOYMENT.md's split-stability note warns about is exactly a
    *     delta row landing on a prior label.
    *
    * Output (node, component) equals recomputing [[minhashNearDups]] +
    * [[connectedComponents]] on the union corpus (the min-label
    * convention survives contraction: a merged component's min
    * contracted label IS the min member id, because every prior label
    * is itself the min of its members). One caveat: if an increment
    * pushes an LSH bucket across `maxBucket`, the batch recompute drops
    * that bucket's candidates while the incremental path keeps its
    * prior edges — the cap is a skew guardrail and crossing it changes
    * which candidates either path considers. The registered query's
    * DuckDB oracle recomputes from scratch, holding the equality
    * cross-engine at gate scale. If a batch RE-INGESTS an existing id,
    * the arriving text is authoritative throughout: the stale shingles
    * are anti-joined away (keyed on the arriving ids, so a
    * content-scrubbing re-ingest whose new text has no k-grams still
    * retires the old shingles), and the id's stale BAND entries are
    * scrubbed from every probed bucket (r14) — so the maxBucket cap
    * counts only live ids and a banding-changing re-ingest cannot make
    * the probe consider candidates the batch recompute would not.
    * Edges the OLD text already contributed to the prior state are
    * still not retracted here — route a content replacement through
    * [[retractFromClusters]] then re-ingest if retraction semantics
    * matter. PRECONDITION: ids are unique
    * WITHIN a batch (the standard CDC-upsert contract; collapse
    * multiple updates per key to the latest before calling — two texts
    * for one id in a single batch would both enter the verify state
    * and the output is defined for neither). Ids are 64-bit longs (the empty-bucket
    * coalesce is typed). The batch's shingle frame is deliberately NOT
    * persisted: it is evaluated twice (index + verify), both
    * batch-sized scans — recomputing beats pinning blocks for the
    * session lifetime. */
  def incrementalNearDupComponents(
      priorComp: DataFrame, existingBuckets: DataFrame,
      existingShingles: DataFrame, arriving: DataFrame,
      idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.8, maxBucket: Int = 1000,
      useMd5: Boolean = true): DataFrame = {
    val arSh = shingleFrame(arriving, idCol, textCol, k)
    val sig = if (useMd5) minhashSignatureMd5(col("sh"), numHashes)
              else minhashSignatureFast(col("sh"), numHashes)
    val arIdx = bandedRows(arSh.withColumn("sig", sig),
      "id", "sig", bands, numHashes / bands, useMd5)
    val arBuckets = arIdx.groupBy(col("band"), col("bh"))
      .agg(collect_list(col("id")).as("new_ids"))
    // Stale-entry retirement (r14, closes the r13 residue): the batch
    // recompute bands every id exactly once, by its NEWEST text, so ANY
    // old_ids entry for an arriving id is stale by definition — not just
    // the same-bucket re-ingest case (where its new banding matches the
    // old), but also the banding-CHANGED case, where the stale entry
    // sits in a bucket the id's new signature no longer maps to. Leaving
    // those: (a) inflates the cap guard's population with dead ids, so a
    // bucket the recompute keeps crosses maxBucket and silently drops
    // its candidates; (b) emits (new, stale) candidates the recompute
    // never considers; (c) could emit (X, X) self-pairs. Scrub by
    // exploding the PROBED buckets' member lists and anti-joining the
    // batch's id set out — linear in the probed index entries with one
    // batch-bounded shuffle (a per-row array_except against the whole
    // batch-id array would be O(|batch|) per bucket row, quadratic per
    // ingest). The id set is batch-sized → broadcast at any corpus
    // scale. Stale entries in UNPROBED buckets are unreachable this
    // batch (no candidates form there); the persisted index retires
    // them at state-update time via [[updatedBandedState]], and any
    // that survive a lagging state get scrubbed here when a later
    // batch probes them.
    // broadcast semi-reduction BEFORE the outer join (r15 review, the
    // updatedBandedState discipline): the probe keys are batch-sized, so
    // the corpus-scale index reduces to the probed buckets with a
    // broadcast semi join (scan + filter, no index exchange) — without
    // it a NON-bucketed index table (the SignalMemo materialization)
    // sort-merge-shuffled the whole index on every arriving batch
    val probedIdx = existingBuckets.join(
      broadcast(arBuckets.select(col("band"), col("bh")).distinct()),
      Seq("band", "bh"), "left_semi")
    val probed = arBuckets.join(probedIdx, Seq("band", "bh"), "left")
    val liveOld = probed
      .select(col("band"), col("bh"),
        explode(coalesce(col("old_ids"), array().cast("array<bigint>"))).as("oid"))
      .join(broadcast(arriving.select(col(idCol).cast("bigint").as("oid")).distinct()),
        Seq("oid"), "left_anti")
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(col("oid")).as("old_ids"))
    val touched = arBuckets.join(liveOld, Seq("band", "bh"), "left")
      .select(col("new_ids"),
        coalesce(col("old_ids"), array().cast("array<bigint>")).as("old_ids"))
      .filter((size(col("new_ids")) + size(col("old_ids")))
        .between(2, maxBucket))
    val cross = touched.select(explode(expr(
      """flatten(transform(new_ids,
        |  n -> transform(old_ids,
        |    o -> struct(least(n, o) AS id_a, greatest(n, o) AS id_b))))"""
        .stripMargin)).as("p"))
    val within = touched.filter(size(col("new_ids")) >= 2)
      .select(pairExplode("new_ids", identity).as("p"))
    val cands = cross.unionByName(within)
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b")).distinct()
    // Re-ingest safety (ADVICE r12): if a batch carries an id the
    // corpus already holds, a naive union keeps TWO shingle rows for
    // it and the verify join fans out, scoring candidates against the
    // stale text. Prefer the arriving row — the shared
    // [[updatedShingleStore]] anti-joins the existing shingles out
    // keyed on the ARRIVING ids (so a content-scrubbing re-ingest
    // still retires its old rows) and unions the batch's fresh
    // shingles in. arSh is passed precomputed: the batch must not
    // shingle twice.
    val shingleState = updatedShingleStore(existingShingles,
      arriving.select(col(idCol).cast("bigint").as("id")).distinct(), arSh)
    val newEdges = jaccardVerify(cands, shingleState, "id", "sh", threshold)
    val lblA = priorComp.select(col("node").as("id_a"), col("component").as("la"))
    val lblB = priorComp.select(col("node").as("id_b"), col("component").as("lb"))
    val contracted = newEdges.select(col("id_a"), col("id_b"))
      .join(lblA, Seq("id_a"), "left").join(lblB, Seq("id_b"), "left")
      .select(coalesce(col("la"), col("id_a")).as("a"),
        coalesce(col("lb"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("id_a"),
        greatest(col("a"), col("b")).as("id_b"))
      .distinct()
    val delta = connectedComponents(contracted)
    // relabel prior members whose label merged; delta nodes that are
    // NOT prior labels are doc ids entering the cluster state directly
    val merged = delta.select(col("node").as("component"), col("component").as("m"))
    val rePrior = priorComp.join(merged, Seq("component"), "left")
      .select(col("node"), coalesce(col("m"), col("component")).as("component"))
    val direct = delta.join(
      priorComp.select(col("component").as("node")).distinct(),
      Seq("node"), "left_anti")
    rePrior.unionByName(direct.select(col("node"), col("component")))
  }

  /** RETRACTION from the cluster state — the takedown / deletion path
    * (the other half of incremental maintenance, and the reason a
    * deployment persists the verified EDGE list, not just labels:
    * deleting a document can SPLIT its component, and labels alone
    * cannot tell which side survives). Given the persisted state
    * (`priorComp` labels + `priorEdges` verified pairs) and the doc ids
    * to remove:
    *
    *  1. affected components = those containing a removed doc — every
    *     other component's rows pass through VERBATIM (an anti-join,
    *     no recompute);
    *  2. surviving edges of the affected components (drop every edge
    *     touching a removed doc) are re-closed with
    *     [[connectedComponents]] — work bounded by the affected
    *     clusters' sizes, never the corpus;
    *  3. members that lost their last edge drop out of the state, like
    *     a from-scratch run would drop them.
    *
    * Output equals recomputing the batch pipeline on the post-delete
    * corpus, with the mirror of the insert path's caveat: deletions can
    * pull an over-`maxBucket` LSH bucket back under the cap, creating
    * candidates the prior state never evaluated — the incremental path
    * cannot manufacture those edges. The registered query's oracle is
    * the full from-scratch DuckDB recompute over the remaining
    * documents, holding the equality cross-engine at gate scale. */
  def retractFromClusters(
      priorComp: DataFrame, priorEdges: DataFrame,
      removed: DataFrame, removedIdCol: String): DataFrame = {
    val rem = removed.select(col(removedIdCol).as("rid")).distinct()
    val affected = priorComp
      .join(rem, priorComp("node") === rem("rid"))
      .select(col("component")).distinct()
    val untouched = priorComp.join(affected.withColumnRenamed("component", "c"),
      priorComp("component") === col("c"), "left_anti")
    val affEdges = priorEdges.select(col("id_a"), col("id_b"))
      .join(priorComp.select(col("node").as("id_a"), col("component").as("ca")),
        Seq("id_a"))
      .join(affected.withColumnRenamed("component", "ca"), Seq("ca"))
      .join(rem.withColumnRenamed("rid", "id_a"), Seq("id_a"), "left_anti")
      .join(rem.withColumnRenamed("rid", "id_b"), Seq("id_b"), "left_anti")
      .select(col("id_a"), col("id_b"))
    untouched.unionByName(connectedComponents(affEdges))
  }

  /** Exact n-gram Jaccard with blocking: all pairs within a blocking key
    * (quadratic per block — the demo/verification path; MinHash is the
    * scale path and the blocking key bounds the quadratic term). */
  def ngramJaccardBlocked(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      k: Int, threshold: Double): DataFrame =
    ngramJaccardOnBlocked(
      df.select(col(blockCol).as("block"), col(idCol),
        TextFunctions.shingles(col(textCol), k).as("sh")), idCol)(threshold)

  /** Blocking by the rolling min-shingle fingerprint, derived from the
    * one shingle pass (1-perm minhash: near-identical docs collide with
    * probability ≈ their Jaccard). */
  def ngramJaccardFingerprintBlocked(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame =
    ngramJaccardOnBlocked(
      df.select(col(idCol), TextFunctions.shingles(col(textCol), k).as("sh"))
        .withColumn("block", array_min(transform(col("sh"), s => md5(s)))),
      idCol)(threshold)

  /** Bucket-collect within blocks (same pattern as lshCandidates): one
    * shuffle groups (id, shingle-set) rows per block, pairs + exact
    * jaccard are computed bucket-locally — no self-join, shingling
    * evaluated once. `maxBlock` caps degenerate blocks; the registered
    * oracle applies the identical cap. */
  private def ngramJaccardOnBlocked(blocked: DataFrame, idCol: String)(
      threshold: Double, maxBlock: Int = 1000): DataFrame = {
    val withSh = blocked.filter(size(col("sh")) > 0 && col("block").isNotNull)
    val buckets = withSh
      .groupBy(col("block"))
      .agg(collect_list(struct(col(idCol).as("id"), col("sh").as("sh"))).as("xs"))
      .filter(size(col("xs")).between(2, maxBlock))
    buckets.select(pairExplode("xs", e => s"$e.id",
        (i, j) => Seq(s"CAST(size(array_intersect($i.sh, $j.sh)) AS DOUBLE)" +
          s" / size(array_union($i.sh, $j.sh)) AS jaccard")).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"), col("p.jaccard").as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** PRESCRIPTIVE selection over a MinHash band-plan table (VERDICT r11
    * ask #3 generalized to the band planner): given the exact S-curve
    * rows (bands, rows_per_band, s_tenths, p_micro), return the banding
    * to run at target similarity `sTenths`. Policy, mirrored verbatim
    * by the `dedup_autoband_choice` DuckDB oracle: among configs whose
    * recall at the target meets `floorMicro`, the LONGEST rows-per-band
    * (finest buckets — the fewest false candidates, i.e. the cheapest
    * verify join — for a fixed 16-hash signature), ties to fewer bands;
    * if none meets the floor, the max-recall config. At the registered
    * operating point (s=0.8, floor 0.85) this selects exactly the
    * registered 4x4 banding — the config the engine ships is the config
    * the planner derives. */
  def autoBanding(plan: DataFrame, sTenths: Int, floorMicro: Long): (Int, Int) = {
    val rows = plan.filter(col("s_tenths") === sTenths).collect()
    require(rows.nonEmpty, s"autoBanding: no plan rows at s_tenths=$sTenths")
    val best = rows.minBy { r =>
      val p = r.getAs[Long]("p_micro")
      (p < floorMicro,
        if (p >= floorMicro) -r.getAs[Int]("rows_per_band").toLong else -p,
        r.getAs[Int]("bands"))
    }
    (best.getAs[Int]("bands"), best.getAs[Int]("rows_per_band"))
  }
}
