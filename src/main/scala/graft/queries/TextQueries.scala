package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis extension queries over `documents` (north star:
  * language-ID, quality scoring, token counting, fingerprinting). Every
  * query is a scan-shaped single pass — no shuffle except the final
  * grouping — so they stream over a 100 TB corpus.
  */
object TextQueries {

  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), tokenCount(col("text")).as("ntok"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("sum_tokens"),
        min(col("ntok")).as("min_tokens"),
        max(col("ntok")).as("max_tokens"),
        (sum(col("ntok")).cast("double") / count(lit(1))).as("avg_tokens"))
      .orderBy(col("lang"))

  def bpeTokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), size(tokensBpe(col("text"))).as("n_bpe_tokens"),
        tokenCount(col("text")).as("n_ws_tokens"))
      .orderBy(col("doc_id"))

  def langIdQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), langId(col("text")).as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))

  def qualityScores(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"),
        qualityScore(col("text")).as("score"))
      .orderBy(col("doc_id"))

  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        fingerprint(col("text")).as("fp"),
        minShingleFingerprint(col("text"), 3).as("min_shingle_fp"))
      .orderBy(col("doc_id"))

  /** Winnowing fingerprint sets, exploded to (doc, fingerprint) rows —
    * the join-ready shape for fingerprint-overlap dedup. */
  def winnowing(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(winnowingFingerprints(col("text"), 3, 4)).as("fp"))
      .orderBy(col("doc_id"), col("fp"))

  /** Fixed-window chunking with overlap (chunk=50 tokens, stride=40):
    * the long-document splitting step of a training pipeline. Pure
    * scan-side generator — chunk starts are a sequence explode, chunk
    * text a bounded slice; no shuffle before the output ordering. */
  def chunks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(0), greatest(size(col("w")) - 1, lit(0)), lit(40))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        concat_ws(" ", slice(col("w"), col("col") + 1, lit(50))).as("chunk"),
        size(slice(col("w"), col("col") + 1, lit(50))).as("n_chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Greedy token-bin packing per language shard: bin id = exclusive
    * prefix token count div 2048, so consecutive docs pack until the
    * budget spills. Packing is inherently sequential, so it runs per
    * partition key (lang) — the window never sees more than one shard,
    * which is how packing distributes at corpus scale. */
  def packBins(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), tokenCount(col("text")).as("ntok"))
      .withColumn("cum", sum(col("ntok")).over(w))
      .withColumn("bin", ((col("cum") - col("ntok")) / 2048).cast("long"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).cast("long").as("n_tokens"))
      .orderBy(col("lang"), col("bin"))
  }

  /** Naive suffix-stripping stemmer (regex shared verbatim by both
    * engines) + stem frequency: the vocabulary-normalization shape.
    * Not linguistic Porter stemming — a deterministic approximation. */
  def stemCounts(spark: SparkSession, dir: String): DataFrame =
    // r19: spread — the explode + per-token regex stem is scan-fused
    Tables.spreadForCompute(Tables.documents(spark, dir), col("doc_id"))
      .select(explode(tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 4)
      .select(regexp_replace(lower(col("tok")), "(ing|ed|es|s)$", "").as("stem"))
      .filter(length(col("stem")) >= 3)
      .groupBy(col("stem")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("stem"))
      .limit(100)

  /** Benchmark-contamination scan (train/test overlap): corpus docs
    * sharing any 5-shingle with the benchmark set (every 37th doc plays
    * the benchmark). Scale shape: the corpus explodes scan-side and
    * semi-aggregates — the 100 TB side never shuffles whole documents,
    * only matched (doc_id, shingle) rows. The benchmark side carries NO
    * broadcast hint: under the registered %37 split it is a fixed
    * FRACTION of the corpus, not a fixed size, and a forced broadcast
    * has no AQE escape (a real deployment's benchmark set IS small and
    * stats/AQE will broadcast it unhinted). */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(explode(shingles(col("text"), 5)).as("sng")).distinct()
    val corpus = docs.filter(col("doc_id") % 37 =!= 0)
      .select(col("doc_id"), explode(shingles(col("text"), 5)).as("sng"))
    corpus.join(bench, Seq("sng"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sng")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style rule-based quality filter (Rae et al.,
    * arXiv:2112.11446 §A1.1): per-document hard rules — word-count
    * bounds, mean-word-length bounds, top-unigram mass cap, stop-word
    * floor — each surfaced as a signal column plus the conjunctive
    * `keep` flag with the first failing rule named. Every flag is
    * decided in exact integer arithmetic (`7·n ≤ 2·sumLen` instead of
    * `3.5 ≤ sumLen/n`) so the decision is engine-portable; the rounded
    * doubles are display-only. Shape: explode → per-(doc, word) partial
    * agg → per-doc agg, the one-shuffle occurrence-stream plan that
    * stays O(doc) for arbitrarily long documents (no per-doc
    * `transform × filter` quadratics), so the filter streams over
    * 100 TB like tf-idf does. */
  def gopherQuality(spark: SparkSession, dir: String): DataFrame = {
    val wc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("n"))
    wc.groupBy(col("doc_id"))
      .agg(
        sum(col("n")).as("n_words"),
        max(col("n")).as("top_word_n"),
        sum(col("n") * length(col("t"))).as("sum_wlen"),
        coalesce(sum(when(col("t").isin("the", "a", "and", "of"), col("n"))),
          lit(0L)).as("n_stop"))
      .withColumn("mean_wlen",
        round(col("sum_wlen").cast("double") / col("n_words"), 9))
      .withColumn("top_word_frac",
        round(col("top_word_n").cast("double") / col("n_words"), 9))
      .withColumn("ok_words",
        (col("n_words") >= 20 && col("n_words") <= 90).cast("int"))
      .withColumn("ok_wlen",
        (col("sum_wlen") * 2 >= col("n_words") * 7 &&
          col("sum_wlen") * 2 <= col("n_words") * 9).cast("int"))
      .withColumn("ok_top",
        (col("top_word_n") * 100 <= col("n_words") * 9).cast("int"))
      .withColumn("ok_stop", (col("n_stop") >= 3).cast("int"))
      .withColumn("keep",
        (col("ok_words") === 1 && col("ok_wlen") === 1 &&
          col("ok_top") === 1 && col("ok_stop") === 1).cast("int"))
      .withColumn("drop_reason",
        when(col("ok_words") === 0, "word_count")
          .when(col("ok_wlen") === 0, "mean_word_length")
          .when(col("ok_top") === 0, "top_word_mass")
          .when(col("ok_stop") === 0, "stop_words")
          .otherwise(lit(null).cast("string")))
      .select(col("doc_id"), col("n_words"), col("mean_wlen"),
        col("top_word_frac"), col("n_stop"), col("keep"), col("drop_reason"))
      .orderBy(col("doc_id"))
  }

  /** Hashed-feature linear classifier inference (the fastText shape,
    * Joulin et al. arXiv:1607.01759): every token hashes into one of
    * 256 weight buckets, the model is the bucket→weight table, and a
    * document's score is the sum of its occurrences' weights. The
    * fixture model is md5-derived (weight = u16(md5('w|'||bucket)) −
    * 32768, an exact integer in [-32768, 32767]) so both engines
    * rebuild it bit-identically; a real run loads trained weights into
    * the same broadcast dim. Shape: occurrence stream → per-(doc,
    * bucket) partial agg (shrinks the stream to ≤256 rows/doc BEFORE
    * the join) → broadcast weights join → per-doc sum. This is model
    * inference as a broadcast hash join — at 100 TB a 10⁶-bucket
    * model is still a few MB broadcast, and the corpus never
    * shuffles anything wider than (doc_id, bucket, count). */
  def classifierScore(spark: SparkSession, dir: String): DataFrame = {
    val weights = spark.range(256).toDF("bucket")
      .select(col("bucket").cast("int").as("bucket"),
        (u16Of(concat(lit("w|"), col("bucket").cast("string"))) - 32768)
          .cast("long").as("w"))
    // r19: spread the unsplittable scan before the tokenize/explode
    // work (identity at production layouts)
    val occ = Tables.spreadForCompute(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      // count distinct (doc, token) BEFORE hashing: one md5 per distinct
      // token per doc instead of per occurrence — Zipf makes this the
      // bulk of the hash work at corpus scale
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("n"))
    // r19: the bucket is a function of the TOKEN alone, so hash the
    // VOCABULARY (Heap's-law rows, ≪ distinct (doc, token) pairs) and
    // equi-join it back instead of md5-ing every (doc, token) row —
    // the occ exchange is shared by both branches (ReusedExchange), and
    // the vocabulary side stays unhinted like the bm25 idf join: AQE
    // broadcasts it while it is actually small and degrades to an
    // equi-join when a 100 TB vocabulary outgrows a broadcast
    val vocabBuckets = occ.select(col("t")).distinct()
      .withColumn("bucket", u16Of(concat(col("t"), lit("|qcls"))) % 256)
    occ.join(vocabBuckets, Seq("t"))
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(col("n") * col("w")).as("score"))
      .withColumn("label", (col("score") > 0).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic augmentation: token dropout at p≈0.1, the text-side
    * analog of the mix sampling draw — each position keeps/drops by an
    * md5 u16 draw keyed (doc_id, position), so the augmented corpus is
    * reproducible run-to-run and engine-to-engine (no RNG state). Pure
    * per-row map — no explode, no shuffle: list HOFs build the keep
    * mask and the surviving-token string in place, so augmentation
    * streams over 100 TB at scan speed. */
  def augmentDropout(spark: SparkSession, dir: String): DataFrame = {
    // same u16 value as u16Of, via one conv() builtin instead of four
    // interpreted nibble CASEs — HOF lambdas don't codegen, so per-token
    // expression weight is the whole cost of this scan
    // guard like shinglesHof: sequence(0, n-1) flips descending when
    // n = 0, and element_at on the empty mask would then throw — safe
    // today only because tokens() never yields an empty array, but the
    // guard costs one codegen branch
    val keepMask = when(size(col("w")) >= 1, transform(
      sequence(lit(0), size(col("w")) - 1),
      i => (conv(substring(md5(concat(col("doc_id").cast("string"), lit("|"),
        i.cast("string"), lit("|aug"))), 1, 4), 16, 10).cast("int") >= 6554).cast("int")))
      .otherwise(array().cast("array<int>"))
    Tables.spreadForCompute(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .withColumn("keep", keepMask)
      .select(col("doc_id"),
        size(col("w")).as("n_tokens"),
        expr("size(filter(keep, k -> k = 0))").as("n_dropped"),
        when(size(col("w")) >= 1, array_join(expr(
          "transform(filter(sequence(0, size(w)-1), i -> element_at(keep, i+1) = 1)," +
            " i -> element_at(w, i+1))"), " ")).otherwise(lit("")).as("aug_text"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style repetition quality signal: share of duplicated
    * bigrams per doc. One scan-side pass, no shuffle but the sort. */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .withColumn("bg",
        expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))"))
      .select(col("doc_id"),
        size(col("bg")).as("n_bigrams"),
        size(array_distinct(col("bg"))).as("n_distinct"),
        round(lit(1.0) - size(array_distinct(col("bg"))).cast("double")
          / size(col("bg")), 9).as("rep_ratio"))
      .orderBy(col("doc_id"))

  /** Training-mix planning: per-source sampling rates toward target
    * shares (shares derived from the source id so the fixture needs no
    * side table; a real run joins a weights dim). Pure aggregate
    * arithmetic — one groupBy shuffle of |sources| rows. */
  def sourceMixPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    counts
      .withColumn("share",
        (substring(col("source"), 4, 10).cast("int") % 4 + 1) / lit(50.0))
      .withColumn("total", sum(col("n_docs")).over(Window.partitionBy()))
      .withColumn("rate",
        round(least(lit(1.0), col("share") * col("total") / col("n_docs")), 9))
      .select(col("source"), col("n_docs"),
        round(col("share"), 9).as("target_share"), col("rate"),
        floor(col("rate") * col("n_docs")).cast("long").as("expected_docs"))
      .orderBy(col("source"))
  }

  /** Execute the training mix: the plan→apply half of `sourceMixPlan`.
    * Every document draws a deterministic md5 uniform (the first 4 hex
    * nibbles of md5(doc_id || "|graftmix") as a 16-bit integer — stable
    * across runs, engines, and partitionings, like `datasetSplit`) and
    * survives iff u/65536 < its source's sampling rate. The ~20-row
    * rate table broadcasts onto the document scan, so applying the mix
    * to 100 TB is one filter pass + one per-source agg — no global
    * shuffle of documents. Output is the per-source reconciliation:
    * planned rate vs achieved kept fraction and surviving characters. */
  /** Per-source (source, n_docs, rate) table — shared by
    * [[sourceMixApply]] and [[curationDecisions]]. */
  private def mixRates(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        (substring(col("source"), 4, 10).cast("int") % 4 + 1) / lit(50.0))
      .withColumn("total", sum(col("n_docs")).over(Window.partitionBy()))
      .withColumn("rate",
        round(least(lit(1.0), col("share") * col("total") / col("n_docs")), 9))
      .select(col("source"), col("n_docs"), col("rate"))
  }

  /** The engine-neutral 16-bit md5 uniform hash (single home:
    * [[graft.functions.TextFunctions.u16]]). */
  private def u16Of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.TextFunctions.u16(c)

  /** 16-bit md5 uniform draw per document (first 4 hex nibbles). */
  private def mixU16: org.apache.spark.sql.Column =
    u16Of(concat(col("doc_id").cast("string"), lit("|graftmix")))

  def sourceMixApply(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rates = mixRates(docs)
    docs.select(col("doc_id"), col("source"), col("n_chars"), mixU16.as("u16"))
      .join(broadcast(rates), "source")
      .withColumn("kept", col("u16").cast("double") / 65536.0 < col("rate"))
      .groupBy(col("source"), col("n_docs"), col("rate"))
      .agg(
        count(when(col("kept"), 1)).as("n_kept"),
        coalesce(sum(when(col("kept"), col("n_chars"))), lit(0L)).as("kept_chars"))
      .select(col("source"), col("n_docs"), col("rate"), col("n_kept"),
        col("kept_chars"),
        round(col("n_kept").cast("double") / col("n_docs"), 9).as("kept_frac"))
      .orderBy(col("source"))
  }

  /** THE curation capstone: one keep/drop decision per document,
    * composing the round's quality signals — exact-dup survivorship
    * (fingerprint window), CCNet perplexity bucket, DSIR target-domain
    * affinity, and the training-mix sampling draw — with a
    * deterministic first-failing drop reason. This is the artifact a
    * curation run actually ships: the decision table a data loader
    * filters against. Each signal keeps its own scale shape (documented
    * on its operator); the composition is four corpus-keyed equi-joins
    * on doc_id, which at 100 TB co-locate when the signal tables share
    * the doc_id partitioning they were written with. */
  /** Exact-dup survivorship as a SIGNAL TABLE like the perplexity/DSIR
    * inputs — memoized (and on-disk under spark.graft.signalDir) so a
    * fresh session's first curation query probes it instead of
    * re-running the fingerprint window over the corpus (VERDICT r8
    * ask #2). Exposed so the bench prep warm can force the build. */
  private[queries] def fpSurvivors(spark: SparkSession, dir: String): DataFrame =
    SignalMemo.cached(spark, dir, "fp_survivors") {
      import org.apache.spark.sql.expressions.Window
      val fpw = Window.partitionBy(col("fp"))
      Tables.documents(spark, dir)
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .withColumn("is_survivor", col("doc_id") === min(col("doc_id")).over(fpw))
        .select(col("doc_id"), col("is_survivor"))
    }

  def curationDecisions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val survivors = fpSurvivors(spark, dir)
    val ppl = perplexityBuckets(spark, dir)
      .select(col("doc_id"), col("bucket").as("ppl_bucket"))
    // "on domain" = importance weight at/above the corpus mean — the
    // relative cut DSIR actually uses (an absolute 0 threshold keeps
    // almost nothing: shared buckets pull every sum negative). The
    // comparison is exact: weight has 6 decimals, so decimal sums and
    // the cross-multiplied mean test are engine-identical.
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val impRaw = AnalyticsQueries.textImportanceWeights(spark, dir)
      .select(col("doc_id"), col("weight").as("imp_weight"))
    val impTot = impRaw.agg(
      sum(col("imp_weight").cast(dec)).as("sum_w"), count(lit(1)).as("n_tot"))
    val imp = impRaw.crossJoin(broadcast(impTot))
      .select(col("doc_id"), col("imp_weight"),
        (col("imp_weight").cast(dec) * col("n_tot") >= col("sum_w")).as("on_domain"))
    val mix = docs.select(col("doc_id"), col("source"), mixU16.as("u16"))
      .join(broadcast(mixRates(docs).select(col("source"), col("rate"))), "source")
      .select(col("doc_id"),
        (col("u16").cast("double") / 65536.0 < col("rate")).as("mix_kept"))
    docs.select(col("doc_id"))
      .join(survivors, "doc_id")
      // LEFT: a doc with fewer than 3 chars has no trigrams, hence no
      // perplexity row — an inner join would emit NO decision for it at
      // all (neither keep nor drop), undefined behavior for a loader
      // filtering against this table. No LM evidence ⇒ classify "tail"
      // (dropped as perplexity_tail), mirrored in the oracle SQL.
      .join(ppl, Seq("doc_id"), "left")
      .withColumn("ppl_bucket", coalesce(col("ppl_bucket"), lit("tail")))
      .join(imp, "doc_id")
      .join(mix, "doc_id")
      .select(col("doc_id"), col("is_survivor"), col("ppl_bucket"),
        col("imp_weight"), col("mix_kept"),
        (col("is_survivor") && col("ppl_bucket") =!= "tail" &&
          col("on_domain") && col("mix_kept")).as("keep"),
        when(!col("is_survivor"), lit("duplicate"))
          .when(col("ppl_bucket") === "tail", lit("perplexity_tail"))
          .when(!col("on_domain"), lit("off_domain"))
          .when(!col("mix_kept"), lit("mix_sampled_out"))
          .otherwise(lit("kept")).as("drop_reason"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic training-order shuffle: the corpus permuted by
    * md5(doc_id || "|graftshuffle") — the order a data loader streams
    * training shards in, stable across runs, engines, and
    * partitionings. At scale the permutation is Spark's
    * range-partitioned distributed sort on the slim (key, id) pair; the
    * gate pins the HEAD of the permutation through
    * TakeOrderedAndProject (no global row_number ever materializes —
    * positions are assigned on the bounded 100-row result). */
  def corpusShuffleOrder(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"),
      md5(concat(col("doc_id").cast("string"), lit("|graftshuffle"))).as("k"))
    keyed.orderBy(col("k"), col("doc_id")).limit(100)
      .withColumn("pos", row_number().over(Window.orderBy(col("k"), col("doc_id"))))
      .select(col("pos"), col("doc_id"), col("n_chars"))
      .orderBy(col("pos"))
  }

  /** Curriculum training order (easy→hard): documents stream in
    * perplexity-bucket phases — head (most LM-predictable) first, then
    * middle, then tail — with a deterministic md5 shuffle WITHIN each
    * phase, composing the memoized perplexity signal with the
    * shuffle-order machinery. Same scale shape as
    * [[corpusShuffleOrder]]: a distributed range sort whose emitted
    * head is a TakeOrderedAndProject (no global row_number over the
    * corpus); the registered query emits the first 100 positions. */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = perplexityBuckets(spark, dir)
      .select(col("doc_id"), col("bucket"), col("logprob_char"),
        when(col("bucket") === "head", 0)
          .when(col("bucket") === "middle", 1).otherwise(2).as("phase"),
        md5(concat(col("doc_id").cast("string"), lit("|graftcurr"))).as("k"))
    keyed.orderBy(col("phase"), col("k"), col("doc_id")).limit(100)
      .withColumn("pos",
        row_number().over(Window.orderBy(col("phase"), col("k"), col("doc_id"))))
      .select(col("pos"), col("doc_id"), col("bucket"), col("logprob_char"))
      .orderBy(col("pos"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2019,
    * arXiv:1911.00359): score each document under a char-trigram LM
    * with add-V smoothing — logprob/char = mean over trigram positions
    * of ln((C(abc)+1)/(C(ab)+V)) — and split the corpus into
    * head/middle/tail thirds by score, the classic quality gate before
    * training. LM counts are one map-combined agg over trigram
    * occurrences (vocabulary-sized result); per-trigram log-probs are
    * quantized to integer micro-units in the LM table so per-doc sums
    * are exact long arithmetic, then the vocabulary-sized LM broadcasts
    * back onto the occurrence stream. The final thirds come from a
    * percent_rank over the slim (doc_id, score) projection; at corpus
    * scale the cutoffs would come from approxQuantile over the same
    * projection instead of a global sort — the LM and scoring passes
    * are unchanged. */
  /** Memoized via [[SignalMemo]]: the standalone query and the
    * `curation_decisions` capstone both consume this signal table; a
    * 100 TB run materializes it once, so the session does too. */
  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame =
    SignalMemo.cached(spark, dir, "perplexity_buckets")(
      perplexityBucketsBuild(spark, dir))
      .orderBy(col("doc_id"))

  private def perplexityBucketsBuild(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // collapse the occurrence stream to per-doc trigram counts FIRST —
    // the natural materialized intermediate of a two-phase LM build (at
    // 100 TB this table is written once and feeds both phases); the
    // persist makes the reuse explicit instead of re-exploding the
    // corpus for the scoring pass. The pin is consumed by the RETURNED
    // plan (memoization materializes it after this function returns),
    // so PinRegistry bounds the corpus-scale cache to two generations
    // instead of leaking it for the session lifetime.
    val triCnt = docs.select(col("doc_id"),
      explode(when(length(col("text")) >= 3,
        expr("transform(sequence(1, length(text)-2), i -> substring(text, i, 3))"))
        .otherwise(array().cast("array<string>"))).as("tri"))
      .groupBy(col("doc_id"), col("tri")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.operators.PinRegistry.replace("queries.perplexityBuckets", Seq(triCnt))
    // LM: trigram counts, context counts (= Σ trigram counts per 2-char
    // prefix), smoothing vocabulary V = distinct continuation chars
    val cnt3 = triCnt.groupBy(col("tri")).agg(sum(col("cnt")).as("c3"))
      .withColumn("ctx", substring(col("tri"), 1, 2))
    val cnt2 = cnt3.groupBy(col("ctx")).agg(sum(col("c3")).as("c2"))
    val vocab = cnt3.select(substring(col("tri"), 3, 1).as("ch")).distinct()
      .agg(count(lit(1)).as("v"))
    val lm = cnt3.join(cnt2, "ctx")
      .crossJoin(broadcast(vocab))
      .select(col("tri"),
        round(log((col("c3") + 1).cast("double") / (col("c2") + col("v")).cast("double")) * 1e6)
          .cast("long").as("lp_q"))
    val scored = triCnt.join(broadcast(lm), "tri")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tri"), sum(col("cnt") * col("lp_q")).as("lp_sum"))
      .select(col("doc_id"), col("n_tri"),
        round(col("lp_sum").cast("double") / col("n_tri") / 1e6, 6).as("logprob_char"))
    // percent_rank WITHOUT the single-partition window funnel: the
    // order carries a unique tiebreak (doc_id), so rank == row_number
    // and percent_rank == (row_number - 1) / (N - 1) EXACTLY — and a
    // global row_number is a distributed two-pass prefix sum of 1s
    // (RunningTotal: range-partition on the order, local sums, one
    // partition-count-sized offset broadcast). A bare
    // `percent_rank().over(Window.orderBy(...))` sorts every per-doc
    // row into ONE task — the funnel this memoized signal (consumed by
    // three registered queries) must not ship at 100 TB.
    val ranked = graft.operators.RunningTotal.withRunningSum(
      scored, Seq(col("logprob_char").desc, col("doc_id")), lit(1), "rn")
    val n = scored.agg(count(lit(1)).as("n_docs"))
    ranked
      .crossJoin(broadcast(n))
      .withColumn("pr",
        when(col("n_docs") > 1,
          (col("rn") - 1).cast("double") / (col("n_docs") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("n_tri"), col("logprob_char"),
        when(col("pr") < 1.0 / 3.0, lit("head"))
          .when(col("pr") < 2.0 / 3.0, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** PII detection scan: email/phone hit counts. The fixture plants a
    * deterministic contact line on every 41st doc so the counts are
    * non-trivial; patterns are dialect-neutral (Java regex == RE2 on
    * this subset). Scan-shaped: one pass, single-row aggregate. */
  def piiScan(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
    Tables.documents(spark, dir)
      .withColumn("text",
        when(col("doc_id") % 41 === 0,
          concat(col("text"), lit(" contact user@example.com or 555-123-4567")))
          .otherwise(col("text")))
      .select(
        // patterns as lit() values, NOT inside expr("...") — the SQL
        // string-literal parser would eat the backslashes ('\b' ->
        // backspace)
        regexp_count(col("text"), lit(emailRe)).as("n_email"),
        regexp_count(col("text"), lit(phoneRe)).as("n_phone"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_email") > 0, 1L).otherwise(0L)).as("docs_with_email"),
        sum(when(col("n_phone") > 0, 1L).otherwise(0L)).as("docs_with_phone"),
        sum(col("n_email").cast("long")).as("total_emails"),
        sum(col("n_phone").cast("long")).as("total_phones"))
  }

  /** Flagship curation report: every per-doc signal a corpus-curation
    * pass needs, in ONE declarative plan — token count, quality score,
    * language-ID, bigram repetition, PII flag, benchmark contamination,
    * exact-dup survivor status. Signal columns are scan-side
    * projections; the only shuffles are the fingerprint window (dup
    * detection), the broadcast contamination semi-join, and the final
    * sort. Catalyst evaluates the shared token array once per branch
    * it needs. */
  def curationReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(explode(shingles(col("text"), 5)).as("sng")).distinct()
    val contaminated = docs.filter(col("doc_id") % 37 =!= 0)
      .select(col("doc_id"), explode(shingles(col("text"), 5)).as("sng"))
      // no broadcast hint: the %37 benchmark split grows with the
      // corpus (see [[contamination]]) — let stats/AQE choose
      .join(bench, Seq("sng"))
      .select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
    val fpw = Window.partitionBy(col("fp"))
    docs
      .select(col("doc_id"), col("text"), tokens(col("text")).as("w"),
        fingerprint(col("text")).as("fp"))
      .withColumn("n_copies", count(lit(1)).over(fpw))
      .withColumn("survivor_id", min(col("doc_id")).over(fpw))
      .join(contaminated, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(col("w")).as("n_tokens"),
        round(qualityScore(col("text")), 9).as("quality"),
        langId(col("text")).as("lang_pred"),
        when(size(col("w")) >= 2,
          round(lit(1.0) -
            size(array_distinct(expr(
              "transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))")))
              .cast("double") / (size(col("w")) - 1), 9))
          .otherwise(lit(0.0)).as("rep_ratio"),
        (regexp_count(col("text"), lit(emailRe)) > 0 ||
          regexp_count(col("text"), lit(phoneRe)) > 0).as("has_pii"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"),
        (col("n_copies") > 1).as("is_dup"),
        (col("doc_id") === col("survivor_id")).as("is_survivor"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic train/val/test split (80/10/10): bucket =
    * md5(doc_id + salt) folded to 0..99 via ascii arithmetic — stable
    * across runs, engines, and partitionings (the property a split MUST
    * have so re-runs never leak val docs into train). Scan-shaped; the
    * only shuffle is the per-split rollup. */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast("string"), lit("|graftsplit")))
    val bucket =
      (ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 100
    Tables.documents(spark, dir)
      .withColumn("split",
        when(bucket < 80, lit("train"))
          .when(bucket < 90, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("split"))
  }

  /** One learned tokenizer per (session, corpus dir) shared by all three
    * BPE queries — re-learning identical merges per query cost ~1.5 s
    * each at sf0.1 (BENCH_NOTES r3); the segmented vocab is checkpointed
    * inside [[graft.operators.Bpe.learn]], so reuse is free. Keyed on the
    * session too: a checkpointed DataFrame dies with its session, so a
    * stale cross-session hit would hold dead block references. */
  private val bpeMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), graft.operators.Bpe.Learned]()

  private def bpeLearned(spark: SparkSession, dir: String): graft.operators.Bpe.Learned = {
    val key = (spark, dir)
    val hit = bpeMemo.get(key)
    if (hit != null) hit
    else {
      val learned = bpeMemo.computeIfAbsent(key, _ =>
        graft.operators.Bpe.learn(Tables.documents(spark, dir), "text", steps = 3))
      // evict every entry of this session when it stops — otherwise the
      // static memo strongly retains dead sessions and their checkpointed
      // frames for the JVM lifetime (duplicate listeners across dirs are
      // harmless: removeIf is idempotent)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          bpeMemo.keySet.removeIf(_._1 eq spark)
      })
      learned
    }
  }

  /** Learn the first 3 BPE merge rules from the corpus (tokenizer
    * training; `text_bpe_tokens` is the apply side). */
  def bpeLearnMerges(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.mergesDf(spark, bpeLearned(spark, dir))
      .orderBy(col("step"))

  /** The apply side of BPE: the vocabulary segmented by the 3 learned
    * merges (word -> subword symbols + corpus frequency). */
  def bpeSegmentVocab(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.segmentsDf(bpeLearned(spark, dir))
      .orderBy(col("word"))

  /** Corpus subword frequencies under the learned BPE vocabulary. */
  def bpeCorpusSubwords(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.corpusSubwords(
        Tables.documents(spark, dir), "text", bpeLearned(spark, dir))
      .orderBy(col("subword"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_learn_merges" -> (bpeLearnMerges _),
    "bpe_segment_vocab" -> (bpeSegmentVocab _),
    "bpe_corpus_subwords" -> (bpeCorpusSubwords _),
    "dataset_split" -> (datasetSplit _),
    "curation_report" -> (curationReport _),
    "text_contamination" -> (contamination _),
    "text_repetition" -> (repetition _),
    "text_gopher_rules" -> (gopherQuality _),
    "text_classifier_score" -> (classifierScore _),
    "text_augment_dropout" -> (augmentDropout _),
    "source_mix_plan" -> (sourceMixPlan _),
    "source_mix_apply" -> (sourceMixApply _),
    "corpus_shuffle_order" -> (corpusShuffleOrder _),
    "curriculum_order" -> (curriculumOrder _),
    "curation_decisions" -> (curationDecisions _),
    "text_perplexity_buckets" -> (perplexityBuckets _),
    "text_pii_scan" -> (piiScan _),
    "text_stem_counts" -> (stemCounts _),
    "text_winnowing" -> (winnowing _),
    "text_token_stats" -> (tokenStats _),
    "text_bpe_tokens" -> (bpeTokenStats _),
    "text_lang_id" -> (langIdQuery _),
    "text_quality" -> (qualityScores _),
    "text_fingerprint" -> (fingerprints _),
    "text_chunks" -> (chunks _),
    "text_pack_bins" -> (packBins _)
  )

  /** SQL hex-nibble value of a single md5 hex char (0-9a-f → 0-15) —
    * mirrors the `nib` expression in [[sourceMixApply]]. */
  private def hexNibble(expr: String): String =
    s"(CASE WHEN ascii($expr) >= 97 THEN ascii($expr) - 87 ELSE ascii($expr) - 48 END)"

  /** Char-trigram LM CTE chain (ends in `pr`: doc_id → n_tri,
    * logprob_char, percent-rank p) — shared by the perplexity-buckets
    * oracle and the curation-decisions composition. */
  private val perplexityCtes =
    """trs AS (
      |  SELECT doc_id,
      |         unnest(CASE WHEN length(text) >= 3
      |                THEN list_transform(range(length(text)-2),
      |                       i -> substr(text, CAST(i + 1 AS INT), 3))
      |                ELSE [] END) AS tri
      |  FROM documents),
      |c3 AS (SELECT tri, COUNT(*) AS c3, substr(tri, 1, 2) AS ctx
      |       FROM trs GROUP BY tri),
      |c2 AS (SELECT ctx, SUM(c3) AS c2 FROM c3 GROUP BY ctx),
      |v AS (SELECT COUNT(DISTINCT substr(tri, 3, 1)) AS v FROM c3),
      |lm AS (
      |  SELECT c3.tri,
      |         CAST(round(ln(CAST(c3.c3 + 1 AS DOUBLE) / CAST(c2.c2 + v.v AS DOUBLE)) * 1e6) AS BIGINT) AS lp_q
      |  FROM c3 JOIN c2 USING (ctx) CROSS JOIN v),
      |sc AS (
      |  SELECT t.doc_id, COUNT(*) AS n_tri,
      |         round(CAST(SUM(lm.lp_q) AS DOUBLE) / COUNT(*) / 1e6, 6) AS logprob_char
      |  FROM trs t JOIN lm ON lm.tri = t.tri GROUP BY t.doc_id),
      |pr AS (
      |  SELECT doc_id, n_tri, logprob_char,
      |         PERCENT_RANK() OVER (ORDER BY logprob_char DESC, doc_id) AS p
      |  FROM sc)""".stripMargin

  /** Per-doc mix-sampling CTE chain (ends in `mw`: doc_id → mix_kept) —
    * the per-document half of the `source_mix_apply` oracle, shared by
    * the curation-decisions composition. */
  private def mixKeptCtes: String =
    s"""mc AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      |mrr AS (
      |  SELECT source,
      |         round(least(CAST(1 AS DOUBLE),
      |               (CAST(substr(source, 4) AS INT) % 4 + 1) / CAST(50 AS DOUBLE)
      |                 * SUM(n_docs) OVER () / n_docs), 9) AS rate
      |  FROM mc),
      |mu AS (
      |  SELECT doc_id, source,
      |         md5(CAST(doc_id AS VARCHAR) || '|graftmix') AS h
      |  FROM documents),
      |mn AS (
      |  SELECT doc_id, source,
      |         ((${hexNibble("substr(h, 1, 1)")} * 16
      |           + ${hexNibble("substr(h, 2, 1)")}) * 16
      |           + ${hexNibble("substr(h, 3, 1)")}) * 16
      |           + ${hexNibble("substr(h, 4, 1)")} AS u16
      |  FROM mu),
      |mw AS (
      |  SELECT mn.doc_id, CAST(mn.u16 AS DOUBLE) / 65536.0 < mrr.rate AS mix_kept
      |  FROM mn JOIN mrr ON mrr.source = mn.source)""".stripMargin

  // Shared SQL fragments (DuckDB): tokens / shingles mirror
  // TextFunctions.tokens/shingles exactly.
  private val tokCte =
    """tok AS (
      |  SELECT doc_id, lang, text,
      |         string_split_regex(trim(text), '\s+') AS w
      |  FROM documents
      |)""".stripMargin

  private val markers = Map(
    "en" -> "('the','a','and','of')",
    "de" -> "('der','die','das','und')",
    "es" -> "('el','la','los','y')",
    "fr" -> "('le','les','et','je')")

  /** The batched-BPE learn, one scan (steps=3 ≤ batchSize, so the whole
    * registry learn is a single batch — `Bpe.learn`'s multi-merge path):
    * pair counts over the vocab (p1), the ranked candidate window
    * (cand1, LIMIT CandidateMargin×3 = 24 matching the Spark side's
    * collect), the greedy disjoint selection replayed as a list_reduce
    * over the ranked list (sel1 — a pair is accepted only if neither of
    * its symbols was claimed by a higher-ranked acceptance; the
    * accumulator is the chr(30)-joined accepted list, initialized by
    * list_reduce to the top-1 pair exactly as the Spark greedy always
    * accepts it), and the whole batch applied in ONE fold pass (wf) —
    * first matching rule in step order wins, bit-identical to the
    * Spark-side multi-rule `aggregate` HOF in `Bpe.mergeFoldExpr`. */
  private def bpeCtes: String =
    s"""words AS (
       |  SELECT w AS word, COUNT(*) AS cnt
       |  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
       |        FROM documents)
       |  GROUP BY w),
       |w0 AS (
       |  SELECT word, array_to_string(list_transform(range(length(word)),
       |           i -> word[CAST(i+1 AS INT)]), ' ') AS s, cnt
       |  FROM words),
       |p1 AS (
       |  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count
       |  FROM (
       |    SELECT cnt, unnest(list_transform(range(len(sym)-1),
       |             i -> sym[CAST(i+1 AS INT)] || ' ' || sym[CAST(i+2 AS INT)])) AS pair
       |    FROM (SELECT string_split(s, ' ') AS sym, cnt FROM w0))
       |  GROUP BY pair),
       |cand1 AS (
       |  SELECT list(pair ORDER BY pair_count DESC, pair) AS cands
       |  FROM (SELECT pair, pair_count FROM p1
       |        ORDER BY pair_count DESC, pair LIMIT 24)),
       |sel1 AS (
       |  SELECT string_split(list_reduce(cands, (acc, cand) ->
       |    CASE WHEN len(string_split(acc, chr(30))) >= 3 THEN acc
       |         WHEN len(list_filter(string_split(cand, ' '),
       |                  sy -> list_contains(flatten(list_transform(
       |                          string_split(acc, chr(30)),
       |                          pp -> string_split(pp, ' '))), sy))) > 0
       |           THEN acc
       |         ELSE acc || chr(30) || cand END), chr(30)) AS accepted
       |  FROM cand1),
       |m1 AS (
       |  SELECT CAST(u.step AS INT) AS step, u.pair,
       |         replace(u.pair, ' ', '') AS merged, p.pair_count,
       |         string_split(u.pair, ' ')[1] AS a, string_split(u.pair, ' ')[2] AS b
       |  FROM (SELECT unnest(accepted) AS pair,
       |               unnest(range(1, len(accepted) + 1)) AS step FROM sel1) u
       |  JOIN p1 p ON p.pair = u.pair),
       |rules AS (
       |  SELECT max(CASE WHEN step = 1 THEN a END) AS a1,
       |         max(CASE WHEN step = 1 THEN b END) AS b1,
       |         max(CASE WHEN step = 1 THEN merged END) AS g1,
       |         max(CASE WHEN step = 2 THEN a END) AS a2,
       |         max(CASE WHEN step = 2 THEN b END) AS b2,
       |         max(CASE WHEN step = 2 THEN merged END) AS g2,
       |         max(CASE WHEN step = 3 THEN a END) AS a3,
       |         max(CASE WHEN step = 3 THEN b END) AS b3,
       |         max(CASE WHEN step = 3 THEN merged END) AS g3
       |  FROM m1),
       |wf AS (
       |  SELECT w.word, list_reduce(string_split(w.s, ' '), (acc, x) ->
       |    CASE WHEN r.b1 IS NOT NULL AND x = r.b1
       |              AND (acc = r.a1 OR ends_with(acc, ' ' || r.a1))
       |         THEN CASE WHEN acc = r.a1 THEN r.g1
       |              ELSE left(acc, length(acc) - length(r.a1) - 1) || ' ' || r.g1 END
       |         WHEN r.b2 IS NOT NULL AND x = r.b2
       |              AND (acc = r.a2 OR ends_with(acc, ' ' || r.a2))
       |         THEN CASE WHEN acc = r.a2 THEN r.g2
       |              ELSE left(acc, length(acc) - length(r.a2) - 1) || ' ' || r.g2 END
       |         WHEN r.b3 IS NOT NULL AND x = r.b3
       |              AND (acc = r.a3 OR ends_with(acc, ' ' || r.a3))
       |         THEN CASE WHEN acc = r.a3 THEN r.g3
       |              ELSE left(acc, length(acc) - length(r.a3) - 1) || ' ' || r.g3 END
       |         ELSE acc || ' ' || x END) AS s, w.cnt
       |  FROM w0 w, rules r)""".stripMargin

  val oracles: Map[String, String] = Map(
    "bpe_learn_merges" ->
      s"""WITH $bpeCtes
         |SELECT step, pair, merged, pair_count FROM m1
         |ORDER BY step""".stripMargin,
    "bpe_segment_vocab" ->
      s"""WITH $bpeCtes
         |SELECT word, s AS segments, cnt FROM wf ORDER BY word""".stripMargin,
    "bpe_corpus_subwords" ->
      s"""WITH $bpeCtes
         |SELECT subword, CAST(SUM(cnt) AS BIGINT) AS n_occurrences
         |FROM (SELECT cnt, unnest(string_split(s, ' ')) AS subword FROM wf)
         |GROUP BY subword ORDER BY subword""".stripMargin,
    "dataset_split" ->
      """WITH b AS (
        |  SELECT doc_id, n_chars,
        |         (ascii(substr(md5(CAST(doc_id AS VARCHAR) || '|graftsplit'), 1, 1)) * 256
        |          + ascii(substr(md5(CAST(doc_id AS VARCHAR) || '|graftsplit'), 2, 1))) % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "curation_report" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |sh5 AS (
         |  SELECT doc_id,
         |         CASE WHEN len(w) >= 5
         |              THEN list_distinct(list_transform(range(len(w)-4),
         |                     i -> array_to_string(w[i+1:i+5], ' ')))
         |              ELSE [] END AS s
         |  FROM t),
         |bench AS (SELECT DISTINCT unnest(s) AS sng FROM sh5 WHERE doc_id % 37 = 0),
         |contam AS (
         |  SELECT DISTINCT c.doc_id
         |  FROM (SELECT doc_id, unnest(s) AS sng FROM sh5 WHERE doc_id % 37 <> 0) c
         |  JOIN bench b ON c.sng = b.sng),
         |fw AS (
         |  SELECT doc_id, text, w,
         |         COUNT(*) OVER (PARTITION BY md5(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS n_copies,
         |         MIN(doc_id) OVER (PARTITION BY md5(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS survivor_id
         |  FROM t),
         |sig AS (
         |  SELECT doc_id, text, w, n_copies, survivor_id,
         |         len(list_filter(w, x -> x IN ${markers("en")})) AS c_en,
         |         len(list_filter(w, x -> x IN ${markers("de")})) AS c_de,
         |         len(list_filter(w, x -> x IN ${markers("es")})) AS c_es,
         |         len(list_filter(w, x -> x IN ${markers("fr")})) AS c_fr,
         |         list_transform(range(len(w)-1), i -> w[i+1] || ' ' || w[i+2]) AS bg
         |  FROM fw)
         |SELECT s.doc_id,
         |       CAST(len(w) AS INT) AS n_tokens,
         |       round(least(CAST(len(w) AS DOUBLE) / 50.0, 1.0) * 0.5
         |             + (CAST(c_en AS DOUBLE) / CAST(len(w) AS DOUBLE)) * 0.3
         |             + least((CAST(length(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS DOUBLE)
         |                      / CAST(len(w) AS DOUBLE)) / 10.0, 1.0) * 0.2, 9) AS quality,
         |       CASE WHEN c_en > 0 AND c_en = greatest(c_en, c_de, c_es, c_fr) THEN 'en'
         |            WHEN c_de > 0 AND c_de = greatest(c_en, c_de, c_es, c_fr) THEN 'de'
         |            WHEN c_es > 0 AND c_es = greatest(c_en, c_de, c_es, c_fr) THEN 'es'
         |            WHEN c_fr > 0 AND c_fr = greatest(c_en, c_de, c_es, c_fr) THEN 'fr'
         |            ELSE 'und' END AS lang_pred,
         |       CASE WHEN len(w) >= 2
         |            THEN round(CAST(1 AS DOUBLE)
         |                       - CAST(len(list_distinct(bg)) AS DOUBLE) / (len(w) - 1), 9)
         |            ELSE CAST(0 AS DOUBLE) END AS rep_ratio,
         |       (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) > 0
         |        OR len(regexp_extract_all(text, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) > 0) AS has_pii,
         |       (ct.doc_id IS NOT NULL) AS contaminated,
         |       (n_copies > 1) AS is_dup,
         |       (s.doc_id = survivor_id) AS is_survivor
         |FROM sig s LEFT JOIN contam ct ON s.doc_id = ct.doc_id
         |ORDER BY s.doc_id""".stripMargin,
    "text_contamination" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |sh5 AS (
        |  SELECT doc_id,
        |         CASE WHEN len(w) >= 5
        |              THEN list_distinct(list_transform(range(len(w)-4),
        |                     i -> array_to_string(w[i+1:i+5], ' ')))
        |              ELSE [] END AS s
        |  FROM t),
        |bench AS (SELECT DISTINCT unnest(s) AS sng FROM sh5 WHERE doc_id % 37 = 0),
        |corpus AS (SELECT doc_id, unnest(s) AS sng FROM sh5 WHERE doc_id % 37 <> 0)
        |SELECT c.doc_id, CAST(COUNT(DISTINCT c.sng) AS BIGINT) AS n_shared
        |FROM corpus c JOIN bench b ON c.sng = b.sng
        |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |         list_transform(range(len(w)-1), i -> w[i+1] || ' ' || w[i+2]) AS b
        |  FROM t WHERE len(w) >= 2)
        |SELECT doc_id,
        |       CAST(len(b) AS INT) AS n_bigrams,
        |       CAST(len(list_distinct(b)) AS INT) AS n_distinct,
        |       round(CAST(1 AS DOUBLE)
        |             - CAST(len(list_distinct(b)) AS DOUBLE) / len(b), 9) AS rep_ratio
        |FROM bg ORDER BY doc_id""".stripMargin,
    "text_gopher_rules" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents),
        |wc AS (SELECT doc_id, t, COUNT(*) AS n FROM tok GROUP BY doc_id, t),
        |sig AS (
        |  SELECT doc_id,
        |         SUM(n) AS n_words,
        |         MAX(n) AS top_word_n,
        |         SUM(n * length(t)) AS sum_wlen,
        |         SUM(CASE WHEN t IN ('the','a','and','of') THEN n ELSE 0 END) AS n_stop
        |  FROM wc GROUP BY doc_id),
        |fl AS (
        |  SELECT doc_id, n_words, top_word_n, sum_wlen, n_stop,
        |         CASE WHEN n_words BETWEEN 20 AND 90 THEN 1 ELSE 0 END AS ok_words,
        |         CASE WHEN sum_wlen * 2 >= n_words * 7
        |               AND sum_wlen * 2 <= n_words * 9 THEN 1 ELSE 0 END AS ok_wlen,
        |         CASE WHEN top_word_n * 100 <= n_words * 9 THEN 1 ELSE 0 END AS ok_top,
        |         CASE WHEN n_stop >= 3 THEN 1 ELSE 0 END AS ok_stop
        |  FROM sig)
        |SELECT doc_id,
        |       CAST(n_words AS BIGINT) AS n_words,
        |       round(CAST(sum_wlen AS DOUBLE) / n_words, 9) AS mean_wlen,
        |       round(CAST(top_word_n AS DOUBLE) / n_words, 9) AS top_word_frac,
        |       CAST(n_stop AS BIGINT) AS n_stop,
        |       CASE WHEN ok_words = 1 AND ok_wlen = 1 AND ok_top = 1
        |             AND ok_stop = 1 THEN 1 ELSE 0 END AS keep,
        |       CASE WHEN ok_words = 0 THEN 'word_count'
        |            WHEN ok_wlen = 0 THEN 'mean_word_length'
        |            WHEN ok_top = 0 THEN 'top_word_mass'
        |            WHEN ok_stop = 0 THEN 'stop_words'
        |            ELSE NULL END AS drop_reason
        |FROM fl ORDER BY doc_id""".stripMargin,
    "text_augment_dropout" -> {
      def u16aug = {
        def nib(p: Int) =
          hexNibble(s"substr(md5(doc_id || '|' || i || '|aug'), $p, 1)")
        s"((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)}"
      }
      s"""WITH t AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |k AS (
         |  SELECT doc_id, w,
         |         list_transform(range(len(w)), i ->
         |           CASE WHEN $u16aug >= 6554 THEN 1 ELSE 0 END) AS keep
         |  FROM t)
         |SELECT doc_id,
         |       CAST(len(w) AS INT) AS n_tokens,
         |       CAST(len(list_filter(keep, x -> x = 0)) AS INT) AS n_dropped,
         |       array_to_string(list_transform(
         |         list_filter(range(len(w)), i -> keep[CAST(i AS INT) + 1] = 1),
         |         i -> w[CAST(i AS INT) + 1]), ' ') AS aug_text
         |FROM k ORDER BY doc_id""".stripMargin
    },
    "text_classifier_score" -> {
      def u16 = s"((${hexNibble("substr(h, 1, 1)")} * 16 + ${hexNibble("substr(h, 2, 1)")}) * 16 + " +
        s"${hexNibble("substr(h, 3, 1)")}) * 16 + ${hexNibble("substr(h, 4, 1)")}"
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
         |  FROM documents),
         |hb AS (SELECT doc_id, md5(t || '|qcls') AS h FROM tok),
         |occ AS (SELECT doc_id, ($u16) % 256 AS bucket FROM hb),
         |oc AS (SELECT doc_id, bucket, COUNT(*) AS n FROM occ GROUP BY doc_id, bucket),
         |wh AS (SELECT i, md5('w|' || CAST(i AS VARCHAR)) AS h FROM range(256) r(i)),
         |wt AS (SELECT CAST(i AS INT) AS bucket, ($u16) - 32768 AS w FROM wh)
         |SELECT o.doc_id,
         |       CAST(SUM(o.n) AS BIGINT) AS n_tokens,
         |       CAST(SUM(o.n * w.w) AS BIGINT) AS score,
         |       CASE WHEN SUM(o.n * w.w) > 0 THEN 1 ELSE 0 END AS label
         |FROM oc o JOIN wt w USING (bucket)
         |GROUP BY o.doc_id ORDER BY o.doc_id""".stripMargin
    },
    "source_mix_apply" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        |r AS (
        |  SELECT source, n_docs,
        |         round(least(CAST(1 AS DOUBLE),
        |               (CAST(substr(source, 4) AS INT) % 4 + 1) / CAST(50 AS DOUBLE)
        |                 * SUM(n_docs) OVER () / n_docs), 9) AS rate
        |  FROM c),
        |u AS (
        |  SELECT doc_id, source, n_chars,
        |         md5(CAST(doc_id AS VARCHAR) || '|graftmix') AS h
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, source, n_chars,
        |         ((${hexNibble("substr(h, 1, 1)")} * 16
        |           + ${hexNibble("substr(h, 2, 1)")}) * 16
        |           + ${hexNibble("substr(h, 3, 1)")}) * 16
        |           + ${hexNibble("substr(h, 4, 1)")} AS u16
        |  FROM u),
        |j AS (
        |  SELECT n.source, r.n_docs, r.rate, n.n_chars,
        |         CAST(n.u16 AS DOUBLE) / 65536.0 < r.rate AS kept
        |  FROM n JOIN r ON r.source = n.source)
        |SELECT source, n_docs, rate,
        |       COUNT(*) FILTER (WHERE kept) AS n_kept,
        |       COALESCE(CAST(SUM(n_chars) FILTER (WHERE kept) AS BIGINT), 0) AS kept_chars,
        |       round(CAST(COUNT(*) FILTER (WHERE kept) AS DOUBLE) / n_docs, 9) AS kept_frac
        |FROM j GROUP BY source, n_docs, rate ORDER BY source""".stripMargin,
    // Composition of the importance / perplexity / mix CTE chains plus
    // the fingerprint-survivor window — one decision row per document.
    "curation_decisions" ->
      (s"WITH ${AnalyticsQueries.importanceCtes},\n$perplexityCtes,\n$mixKeptCtes,\n" +
        """fps AS (
        |  SELECT doc_id,
        |         md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |surv AS (
        |  SELECT doc_id,
        |         doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS is_survivor
        |  FROM fps),
        |impw0 AS (
        |  SELECT d.doc_id,
        |         round(CAST(COALESCE(pd.wq, 0) AS DOUBLE) / 1e6, 6) AS imp_weight
        |  FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id),
        |impt AS (
        |  SELECT SUM(CAST(imp_weight AS DECIMAL(18,6))) AS sum_w,
        |         COUNT(*) AS n_tot
        |  FROM impw0),
        |impw AS (
        |  SELECT doc_id, imp_weight,
        |         CAST(imp_weight AS DECIMAL(18,6)) * n_tot >= sum_w AS on_domain
        |  FROM impw0 CROSS JOIN impt),
        |pplb AS (
        |  SELECT doc_id,
        |         CASE WHEN p < 1.0/3.0 THEN 'head'
        |              WHEN p < 2.0/3.0 THEN 'middle'
        |              ELSE 'tail' END AS ppl_bucket
        |  FROM pr)
        |SELECT d.doc_id, surv.is_survivor,
        |       COALESCE(pplb.ppl_bucket, 'tail') AS ppl_bucket,
        |       impw.imp_weight,
        |       mw.mix_kept,
        |       (surv.is_survivor AND COALESCE(pplb.ppl_bucket, 'tail') <> 'tail'
        |        AND impw.on_domain AND mw.mix_kept) AS keep,
        |       CASE WHEN NOT surv.is_survivor THEN 'duplicate'
        |            WHEN COALESCE(pplb.ppl_bucket, 'tail') = 'tail' THEN 'perplexity_tail'
        |            WHEN NOT impw.on_domain THEN 'off_domain'
        |            WHEN NOT mw.mix_kept THEN 'mix_sampled_out'
        |            ELSE 'kept' END AS drop_reason
        |FROM documents d
        |JOIN surv ON surv.doc_id = d.doc_id
        |LEFT JOIN pplb ON pplb.doc_id = d.doc_id
        |JOIN impw ON impw.doc_id = d.doc_id
        |JOIN mw ON mw.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin),
    "corpus_shuffle_order" ->
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |         md5(CAST(doc_id AS VARCHAR) || '|graftshuffle') AS k
        |  FROM documents),
        |h AS (SELECT doc_id, n_chars, k FROM k ORDER BY k, doc_id LIMIT 100)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY k, doc_id) AS INT) AS pos,
        |       doc_id, n_chars
        |FROM h ORDER BY pos""".stripMargin,
    "text_perplexity_buckets" ->
      (s"WITH $perplexityCtes\n" +
        """SELECT doc_id, n_tri, logprob_char,
        |       CASE WHEN p < 1.0/3.0 THEN 'head'
        |            WHEN p < 2.0/3.0 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM pr ORDER BY doc_id""".stripMargin),
    "curriculum_order" ->
      (s"WITH $perplexityCtes,\n" +
        """b AS (
        |  SELECT doc_id, logprob_char,
        |         CASE WHEN p < 1.0/3.0 THEN 'head'
        |              WHEN p < 2.0/3.0 THEN 'middle'
        |              ELSE 'tail' END AS bucket
        |  FROM pr),
        |kk AS (
        |  SELECT doc_id, bucket, logprob_char,
        |         CASE bucket WHEN 'head' THEN 0 WHEN 'middle' THEN 1 ELSE 2 END AS phase,
        |         md5(CAST(doc_id AS VARCHAR) || '|graftcurr') AS k
        |  FROM b)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY phase, k, doc_id) AS INT) AS pos,
        |       doc_id, bucket, logprob_char
        |FROM kk ORDER BY phase, k, doc_id LIMIT 100""".stripMargin),
    "source_mix_plan" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        |s AS (
        |  SELECT source, n_docs,
        |         (CAST(substr(source, 4) AS INT) % 4 + 1) / CAST(50 AS DOUBLE) AS share,
        |         SUM(n_docs) OVER () AS total
        |  FROM c)
        |SELECT source, n_docs, round(share, 9) AS target_share,
        |       round(least(CAST(1 AS DOUBLE), share * total / n_docs), 9) AS rate,
        |       CAST(floor(round(least(CAST(1 AS DOUBLE), share * total / n_docs), 9)
        |                  * n_docs) AS BIGINT) AS expected_docs
        |FROM s ORDER BY source""".stripMargin,
    "text_pii_scan" ->
      """WITH d AS (
        |  SELECT CASE WHEN doc_id % 41 = 0
        |              THEN text || ' contact user@example.com or 555-123-4567'
        |              ELSE text END AS text
        |  FROM documents),
        |m AS (
        |  SELECT len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |         len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phone
        |  FROM d)
        |SELECT COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
        |       CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
        |       CAST(SUM(n_email) AS BIGINT) AS total_emails,
        |       CAST(SUM(n_phone) AS BIGINT) AS total_phones
        |FROM m""".stripMargin,
    "text_stem_counts" ->
      s"""WITH $tokCte,
         |t AS (SELECT unnest(w) AS tok FROM tok),
         |st AS (
         |  SELECT regexp_replace(lower(tok), '(ing|ed|es|s)$$', '') AS stem
         |  FROM t WHERE length(tok) >= 4)
         |SELECT stem, COUNT(*) AS n FROM st
         |WHERE length(stem) >= 3
         |GROUP BY stem ORDER BY n DESC, stem LIMIT 100""".stripMargin,
    "text_winnowing" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS wd
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |         CASE WHEN len(wd) >= 3
        |              THEN list_transform(range(len(wd)-2),
        |                     i -> md5(array_to_string(wd[i+1:i+3], ' ')))
        |              ELSE [] END AS hs
        |  FROM t),
        |fp AS (
        |  SELECT doc_id,
        |         CASE WHEN len(hs) >= 4
        |              THEN list_distinct(list_transform(range(len(hs)-3),
        |                     j -> list_min(hs[j+1:j+4])))
        |              WHEN len(hs) > 0 THEN [list_min(hs)]
        |              ELSE [] END AS fps
        |  FROM h)
        |SELECT doc_id, unnest(fps) AS fp FROM fp
        |ORDER BY doc_id, fp""".stripMargin,
    "text_chunks" ->
      s"""WITH $tokCte,
         |st AS (
         |  SELECT doc_id, w, unnest(range(0, greatest(len(w), 1), 40)) AS s
         |  FROM tok)
         |SELECT doc_id, CAST(s // 40 AS INT) AS chunk_idx,
         |       array_to_string(w[s+1:s+50], ' ') AS chunk,
         |       CAST(len(w[s+1:s+50]) AS INT) AS n_chunk_tokens
         |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_pack_bins" ->
      s"""WITH $tokCte,
         |c AS (
         |  SELECT lang, doc_id, len(w) AS ntok,
         |         SUM(len(w)) OVER (PARTITION BY lang ORDER BY doc_id
         |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM tok)
         |SELECT lang, CAST((cum - ntok) // 2048 AS BIGINT) AS bin,
         |       COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens
         |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,
    "text_token_stats" ->
      s"""WITH $tokCte
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(len(w)) AS BIGINT) AS sum_tokens,
         |       MIN(len(w)) AS min_tokens, MAX(len(w)) AS max_tokens,
         |       CAST(SUM(len(w)) AS DOUBLE) / COUNT(*) AS avg_tokens
         |FROM tok GROUP BY lang ORDER BY lang""".stripMargin,
    "text_bpe_tokens" ->
      """SELECT doc_id,
        |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS n_bpe_tokens,
        |       len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_lang_id" ->
      s"""WITH $tokCte,
         |scored AS (
         |  SELECT lang,
         |         len(list_filter(w, t -> t IN ${markers("en")})) AS c_en,
         |         len(list_filter(w, t -> t IN ${markers("de")})) AS c_de,
         |         len(list_filter(w, t -> t IN ${markers("es")})) AS c_es,
         |         len(list_filter(w, t -> t IN ${markers("fr")})) AS c_fr
         |  FROM tok),
         |pred AS (
         |  SELECT lang,
         |         CASE WHEN c_en > 0 AND c_en = greatest(c_en, c_de, c_es, c_fr) THEN 'en'
         |              WHEN c_de > 0 AND c_de = greatest(c_en, c_de, c_es, c_fr) THEN 'de'
         |              WHEN c_es > 0 AND c_es = greatest(c_en, c_de, c_es, c_fr) THEN 'es'
         |              WHEN c_fr > 0 AND c_fr = greatest(c_en, c_de, c_es, c_fr) THEN 'fr'
         |              ELSE 'und' END AS predicted
         |  FROM scored)
         |SELECT lang, predicted, COUNT(*) AS n
         |FROM pred GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    "text_quality" ->
      s"""WITH $tokCte
         |SELECT doc_id, len(w) AS n_tokens,
         |       least(CAST(len(w) AS DOUBLE) / 50.0, 1.0) * 0.5
         |       + (CAST(len(list_filter(w, t -> t IN ${markers("en")})) AS DOUBLE)
         |          / CAST(len(w) AS DOUBLE)) * 0.3
         |       + least((CAST(length(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS DOUBLE)
         |                / CAST(len(w) AS DOUBLE)) / 10.0, 1.0) * 0.2 AS score
         |FROM tok ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w,
        |         md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, fp,
        |         CASE WHEN len(w) >= 3
        |              THEN list_distinct(list_transform(range(len(w)-2),
        |                     i -> array_to_string(w[i+1:i+3], ' ')))
        |              ELSE [] END AS sh
        |  FROM t)
        |SELECT doc_id, fp,
        |       list_min(list_transform(sh, x -> md5(x))) AS min_shingle_fp
        |FROM s ORDER BY doc_id""".stripMargin
  )
}
