package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.RunningTotal
import graft.sources.Tables

/** Weighted sampling, shard routing, and budgeted selection — the
  * "which subset trains" operators of a corpus pipeline, each exactly
  * reproducible (md5-derived draws, integer arithmetic) so the same
  * sample falls out of any engine, any partitioning, any run.
  *
  * The reference pipeline (dotsering/kafka-connect-minio-pipeline)
  * samples nothing — its SMT forwards every surviving record
  * (`smt/src/main/java/org/dorjee/smt/UserProfileTransform.java:24-38`);
  * these extend the curation surface like SURVEY.md §2's other
  * beyond-parity rows.
  */
object SamplingQueries {

  private def u16Of(c: org.apache.spark.sql.Column) = TextFunctions.u16(c)

  /** Priority sampling (Duffield, Lund & Thorup, JACM 2007): a
    * weight-biased sample of fixed size k WITHOUT replacement — each
    * doc draws uniform u ∈ [1, 65536] and competes with priority
    * w·65536/u (integer division); the top k by priority are the
    * sample. Long docs (weight = n_chars) are proportionally likelier
    * to win, every doc has a chance, and the whole draw is one
    * TakeOrderedAndProject — a distributed top-k with NO global sort
    * and NO per-stratum state, the at-scale way to hold "k docs,
    * weight-biased" from a 100 TB corpus in one pass. */
  def samplePriorityWeighted(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").as("weight"))
      .withColumn("u",
        u16Of(concat(col("doc_id").cast("string"), lit("|graftprio"))) + lit(1))
      .withColumn("priority", expr("(weight * 65536) div u"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("weight"), col("priority"))

  /** Rendezvous (highest-random-weight) sharding, Thaler & Ravishankar
    * 1998: doc → argmax over shards of u16(md5(doc|shard)). The
    * coordination-free routing law: any writer anywhere computes the
    * same shard from the key alone, and adding a shard later moves
    * only ~1/(n+1) of the docs (only those whose new draw wins) — the
    * property hash-mod sharding lacks. Pure per-row expressions (the
    * 8 draws are an array_max over structs, whole-stage codegen), one
    * map-combined agg for the per-shard rollup. Ties break to the
    * LOWEST shard id via the (score, 7−s) struct ordering. */
  def shardRendezvous(spark: SparkSession, dir: String): DataFrame = {
    val scores = array((0 to 7).map { s =>
      struct(
        u16Of(concat(col("doc_id").cast("string"), lit(s"|shard|$s")))
          .as("score"),
        lit(7 - s).as("inv"))
    }: _*)
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .withColumn("best", array_max(scores))
      .withColumn("shard", lit(7) - col("best.inv"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_doc_id"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy(col("shard"))
  }

  /** Per-source capped weighted sample: every source contributes at
    * most 50 docs, chosen by the same Duffield-et-al priority draw as
    * [[samplePriorityWeighted]] — the "no source dominates the mix"
    * curation rule executed as ONE aggregation. The per-group top-k
    * runs through [[graft.expressions.TopKByScore]]'s map-side bounded
    * heaps, so only k-sized buffers cross the shuffle per source — a
    * window row_number would move every row of the heaviest source to
    * one task. Priorities fit doubles exactly (≪ 2^53), so the heap's
    * (score desc, id asc) order is the integer order. */
  def sampleSourceCap(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("weight"))
      .withColumn("u",
        u16Of(concat(col("doc_id").cast("string"), lit("|graftprio"))) + lit(1))
      .withColumn("priority", expr("(weight * 65536) div u"))
      .groupBy(col("source"))
      .agg(graft.expressions.TopKByScore.topk(
        col("priority").cast("double"), col("doc_id"), 50).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rk"),
        col("e.id").as("doc_id"), col("e.score").cast("long").as("priority"))
      .orderBy(col("source"), col("rk"))

  /** Budgeted quality selection: keep the highest-quality docs whose
    * cumulative token count fits a budget (half the corpus's tokens) —
    * the knapsack-greedy "what actually trains" cut. The running total
    * over the global (quality DESC, doc_id) order comes from
    * [[RunningTotal]]'s two-pass distributed prefix sum, NOT a
    * single-partition window — the difference between this operator
    * working at 100 TB and moving the corpus to one task. Quality is
    * micro-quantized to a long so the order (and therefore the cut
    * line) is identical in any engine. */
  def budgetSelectTokens(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        round(TextFunctions.qualityScore(col("text")) * lit(1000000.0))
          .cast("long").as("q_micro"))
    val withCum = RunningTotal.withRunningSum(scored,
      Seq(col("q_micro").desc, col("doc_id").asc), col("n_tokens"),
      "cum_tokens")
    // budget = half the total; total == max inclusive running sum, read
    // back through withRunningSum's persisted partitioning instead of a
    // second full scan that would re-tokenize the whole corpus
    // (r15 review: the old `scored.agg(sum(n_tokens))` doubled the
    // query's I/O and tokenization CPU)
    val budget = withCum.agg(expr("max(cum_tokens) div 2").as("budget"))
    withCum
      .crossJoin(broadcast(budget))
      .filter(col("cum_tokens") <= col("budget"))
      .select(col("doc_id"), col("n_tokens"), col("q_micro"),
        col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Cross-document sequence PACKING (concat-and-chunk): stream the
    * corpus in the deterministic md5 shuffle order (the same
    * `|graftshuffle` permutation the data-loader queries use),
    * concatenate the token streams, and cut fixed 512-token context
    * windows. Each document maps to its token span [tok_start,
    * tok_start + n_tokens) → first/last window ids, how many windows it
    * spans, and whether it straddles a boundary (the truncation /
    * cross-document-attention-mask site a trainer must handle). This is
    * the packing step of an LLM data loader made into a relation.
    * (Complements `text_pack_bins`, which aggregates per-LANGUAGE bin
    * occupancy under a lang-partitioned window; this one is the GLOBAL
    * permuted doc→window assignment, which has no partitioning key and
    * therefore needs the distributed prefix sum.)
    *
    * Scale shape: the global token offsets come from [[RunningTotal]]'s
    * two-pass distributed prefix sum over the slim (key, doc_id,
    * n_tokens) projection — never a single-partition window; everything
    * after the offsets is per-row arithmetic. */
  def corpusPackWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = 512L
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        md5(concat(col("doc_id").cast("string"), lit("|graftshuffle"))).as("k"))
      .filter(col("n_tokens") > 0)
    RunningTotal.withRunningSum(keyed,
        Seq(col("k").asc, col("doc_id").asc), col("n_tokens"), "cum_tokens")
      .withColumn("tok_start", col("cum_tokens") - col("n_tokens"))
      .withColumn("first_window", expr(s"tok_start div $w"))
      .withColumn("last_window", expr(s"(cum_tokens - 1) div $w"))
      .select(col("doc_id"), col("n_tokens"), col("tok_start"),
        col("first_window"), col("last_window"),
        (col("last_window") - col("first_window") + 1).as("n_windows"),
        (col("first_window") =!= col("last_window")).as("crosses_boundary"))
      .orderBy(col("doc_id"))
  }

  private def hexNibble(e: String): String =
    s"(CASE WHEN ascii($e) >= 97 THEN ascii($e) - 87 ELSE ascii($e) - 48 END)"

  /** u16 of an md5 hex column named `h` (the SQL mirror of
    * [[TextFunctions.u16]]). */
  private def u16SqlOfH: String =
    s"""(((${hexNibble("substr(h, 1, 1)")} * 16
       |   + ${hexNibble("substr(h, 2, 1)")}) * 16
       |   + ${hexNibble("substr(h, 3, 1)")}) * 16
       |   + ${hexNibble("substr(h, 4, 1)")})""".stripMargin

  /** The shared quality formula (TextFunctions.qualityScore), micro-
    * quantized — same expression the dedup_best_survivor oracle uses. */
  private val qualCte =
    """qual AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
      |         CAST(round((least(CAST(len(w) AS DOUBLE) / 50.0, 1.0) * 0.5
      |           + (CAST(len(list_filter(w, t -> t IN ('the','a','and','of'))) AS DOUBLE)
      |              / CAST(len(w) AS DOUBLE)) * 0.3
      |           + least((CAST(length(regexp_replace(trim(text), '\s+', ' ', 'g')) AS DOUBLE)
      |                    / CAST(len(w) AS DOUBLE)) / 10.0, 1.0) * 0.2) * 1000000)
      |              AS BIGINT) AS q_micro
      |  FROM (SELECT doc_id, text,
      |          string_split_regex(trim(text), '\s+') AS w FROM documents))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_priority_weighted" -> (samplePriorityWeighted _),
    "sample_source_cap" -> (sampleSourceCap _),
    "shard_rendezvous" -> (shardRendezvous _),
    "budget_select_tokens" -> (budgetSelectTokens _),
    "corpus_pack_windows" -> (corpusPackWindows _)
  )

  val oracles: Map[String, String] = Map(
    "sample_priority_weighted" ->
      s"""WITH p AS (
         |  SELECT doc_id, n_chars AS weight,
         |         md5(CAST(doc_id AS VARCHAR) || '|graftprio') AS h
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, weight,
         |         (weight * 65536) // ($u16SqlOfH + 1) AS priority
         |  FROM p)
         |SELECT doc_id, weight, priority FROM q
         |ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin,
    "sample_source_cap" ->
      s"""WITH p AS (
         |  SELECT doc_id, source, n_chars AS weight,
         |         md5(CAST(doc_id AS VARCHAR) || '|graftprio') AS h
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source,
         |         (weight * 65536) // ($u16SqlOfH + 1) AS priority
         |  FROM p),
         |r AS (
         |  SELECT source, doc_id, priority,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY priority DESC, doc_id ASC) AS INT) AS rk
         |  FROM q)
         |SELECT source, rk, doc_id, priority FROM r
         |WHERE rk <= 50 ORDER BY source, rk""".stripMargin,
    "shard_rendezvous" ->
      s"""WITH s AS (
         |  SELECT doc_id, CAST(u.s AS INT) AS shard,
         |         md5(CAST(doc_id AS VARCHAR) || '|shard|' || CAST(u.s AS VARCHAR)) AS h
         |  FROM documents, UNNEST(range(8)) AS u(s)),
         |sc AS (SELECT doc_id, shard, $u16SqlOfH AS score FROM s),
         |pick AS (
         |  SELECT doc_id, shard,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY score DESC, shard ASC) AS rn
         |  FROM sc)
         |SELECT shard, COUNT(*) AS n_docs,
         |       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
         |       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
         |FROM pick WHERE rn = 1 GROUP BY shard ORDER BY shard""".stripMargin,
    "budget_select_tokens" ->
      s"""WITH $qualCte,
         |b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 AS budget FROM qual),
         |c AS (
         |  SELECT doc_id, n_tokens, q_micro,
         |         CAST(SUM(n_tokens) OVER (ORDER BY q_micro DESC, doc_id ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |           AS cum_tokens
         |  FROM qual)
         |SELECT doc_id, n_tokens, q_micro, cum_tokens FROM c, b
         |WHERE cum_tokens <= budget ORDER BY doc_id""".stripMargin,
    "corpus_pack_windows" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |           AS n_tokens,
        |         md5(CAST(doc_id AS VARCHAR) || '|graftshuffle') AS k
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(SUM(n_tokens) OVER (ORDER BY k, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS cum_tokens
        |  FROM t WHERE n_tokens > 0)
        |SELECT doc_id, n_tokens,
        |       cum_tokens - n_tokens AS tok_start,
        |       (cum_tokens - n_tokens) // 512 AS first_window,
        |       (cum_tokens - 1) // 512 AS last_window,
        |       (cum_tokens - 1) // 512 - (cum_tokens - n_tokens) // 512 + 1
        |         AS n_windows,
        |       ((cum_tokens - 1) // 512 <> (cum_tokens - n_tokens) // 512)
        |         AS crosses_boundary
        |FROM c ORDER BY doc_id""".stripMargin
  )
}
