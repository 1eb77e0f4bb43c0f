package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline extension surface
  * (BASELINE.json north star): tokenization, shingling, fingerprinting,
  * language-ID scoring, and quality scoring — all as codegen-friendly
  * built-in `functions._` compositions (no UDFs), so they stay inside
  * whole-stage codegen on a 100 TB scan.
  *
  * Cross-engine determinism: every function here has an exact ANSI-SQL
  * rendering (used by the DuckDB oracles) — md5 for hashes (bit-identical
  * everywhere, unlike engine-private hash functions), fixed-order float
  * arithmetic for scores.
  */
object TextFunctions {

  /** Whitespace tokenization (the BPE-ish regex variant is `tokensBpe`).
    *
    * CONTRACT for empty input: split(trim("")) yields [""] — ONE empty
    * token, so tokenCount("") = 1, not 0. Every DuckDB oracle renders
    * the same artifact (string_split of "" gives [""]), so the parity
    * gates hold by construction; it also keeps qualityScore's
    * stop/n and avgLen/n divisions total. Where emptiness matters,
    * guard explicitly (Bpe.learn filters length(word) >= 1). Changing
    * this to [] would shift every token-counting oracle — a
    * coordinated cross-engine migration, not a local fix. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** First 4 md5 hex nibbles of a string column as a 16-bit int — THE
    * engine-neutral uniform hash (DuckDB oracles rebuild it from the
    * same md5 hex). Single home for the nibble decoding; every uniform
    * draw (mix sampling, Bloom bit positions, classifier weights) goes
    * through here so the two engines can never drift. */
  def u16(c: Column): Column = {
    val h = md5(c)
    def nib(p: Int) = {
      val a = ascii(substring(h, p, 1))
      when(a >= 97, a - 87).otherwise(a - 48)
    }
    ((nib(1) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4)
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish pre-tokenizer: splits out word pieces, numbers, and
    * punctuation runs (public GPT-2-style pretoken regex, simplified to
    * the POSIX classes both Spark and DuckDB regex engines share). */
  def tokensBpe(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0))

  /** Whitespace-normalized text: collapse runs, trim. */
  def normalized(text: Column): Column =
    regexp_replace(trim(text), "\\s+", " ")

  /** Document fingerprint: md5 of normalized text (exact-dup key). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Distinct word k-shingles (fused custom expression; docs shorter
    * than k tokens get an empty array). `shinglesHof` is the composable
    * reference formulation — tests assert bit-equality. */
  def shingles(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ExprBridge
    ExprBridge.column(graft.expressions.WordShingles(ExprBridge.expression(text), k))
  }

  def shinglesHof(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    // guard: Spark's sequence(0, n) flips to a descending range when
    // n < 0, which would fabricate shingles on short docs
    when(n >= k,
      array_distinct(transform(sequence(lit(0), n - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Rolling-hash fingerprint: the lexicographic min of shingle md5s — a
    * 1-perm minhash usable as a cheap near-dup bucket key. Fused custom
    * expression; `minShingleFingerprintHof` is the composable reference
    * implementation (tests assert bit-equality). */
  def minShingleFingerprint(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ExprBridge
    ExprBridge.column(graft.expressions.MinShingleMd5(ExprBridge.expression(text), k))
  }

  def minShingleFingerprintHof(text: Column, k: Int): Column =
    array_min(transform(shingles(text, k), s => md5(s)))

  /** Winnowing fingerprints (the MOSS rolling-hash scheme): hash every
    * ordered k-shingle (with duplicates), slide a window of `w` hashes,
    * keep each window's minimum, dedupe. Position-robust multi-
    * fingerprint sets — two documents sharing any sufficiently long run
    * share a fingerprint. Fused custom expression (one pass); the HOF
    * reference below re-hashes the shingle array per window lambda —
    * O(windows × shingles) md5 calls — and exists only for the
    * bit-equality test. SQL-renderable (DuckDB list slicing) for the
    * oracle. */
  def winnowingFingerprints(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graft.ExprBridge
    ExprBridge.column(graft.expressions.WinnowingFingerprints(
      ExprBridge.expression(text), k, w))
  }

  def winnowingFingerprintsHof(text: Column, k: Int, w: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val hashes = when(n >= k,
      transform(sequence(lit(0), n - k),
        i => md5(concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))
    val nh = size(hashes)
    when(nh >= w,
      array_distinct(transform(sequence(lit(0), nh - w),
        j => array_min(slice(hashes, j + 1, lit(w))))))
      .otherwise(when(nh > 0, array(array_min(hashes)))
        .otherwise(array().cast("array<string>")))
  }

  /** Language-ID by marker-token counting (n-gram heuristic): count
    * profile hits with multiplicity, argmax with a fixed precedence.
    * Deterministic and SQL-renderable; real profiles are swappable. */
  /** The English marker set — single home, shared by [[langProfiles]]
    * and [[qualityScore]] (two literal copies had already been declared
    * once; an edit to one would silently diverge the other). */
  val enStopwords: Seq[String] = Seq("the", "a", "and", "of")

  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> enStopwords,
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "et", "je"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    langProfiles.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isInCollection(markers)))
    }
  }

  /** Predicted language: the EARLIEST profile (in declaration order)
    * whose score equals the maximum and is > 0 — ties resolve to the
    * earlier-declared language; else "und". */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.foldLeft(lit(0)) { case (acc, (_, s)) => greatest(acc, s) }
    scores.foldRight(lit("und")) { case ((lang, s), other) =>
      when(s > 0 && s === best, lit(lang)).otherwise(other)
    }
  }

  /** Quality score in [0,1]: saturating token count, marker-stopword
    * ratio, mean token length — fixed evaluation order so Spark and
    * DuckDB produce bit-identical doubles. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val stop = size(filter(tokens(text),
      t => t.isInCollection(enStopwords))).cast("double")
    val avgLen = length(normalized(text)).cast("double") / n
    least(n / lit(50.0), lit(1.0)) * lit(0.5) +
      (stop / n) * lit(0.3) +
      least(avgLen / lit(10.0), lit(1.0)) * lit(0.2)
  }
}
