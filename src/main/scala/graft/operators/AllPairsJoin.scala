package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact all-pairs similarity self-join with prefix filtering
  * (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
  * WWW 2007) — EVERY pair with Jaccard ≥ τ, found without comparing
  * every pair.
  *
  * The LSH family ([[Dedup.minhashNearDups]]) is probabilistic: banding
  * can miss true pairs. This operator is EXACT — the prefix-filtering
  * principle guarantees no pair above the threshold is lost: order the
  * token universe by ascending document frequency; if two sets overlap
  * enough to reach τ, they MUST share a token within each other's first
  * `|d| − ceil(τ·|d|) + 1` rarest tokens. So only those prefix tokens
  * are indexed, and candidates meet only through rare tokens —
  * boilerplate tokens shared by half the corpus never generate pairs.
  *
  * Scale shape (all shuffles key on token or doc id, never payloads):
  *  1. document-frequency table: one map-combined hash agg over
  *     (doc, shingle) rows;
  *  2. per-doc prefix selection: a doc-partitioned window picks each
  *     doc's p rarest shingles — ordering is the GLOBAL (df, token)
  *     tuple itself, so no global rank assignment (a corpus-wide
  *     row_number would be a single-partition sort) is ever built;
  *  3. candidate generation: prefix ⋈ prefix on the shingle — posting
  *     lists exist only for rare tokens, bounding the quadratic blowup
  *     the way the paper's Figure 5 shows;
  *  4. verification: candidate pairs (ids only) fetch the two docs'
  *     distinct-shingle arrays (doc-sized payloads, candidate-bounded
  *     work) and check `tauDen·|A∩B| ≥ tauNum·|A∪B|` in exact integer
  *     arithmetic.
  *
  * Residual skew caveat: a token can still be MANY docs' rarest token
  * (a corpus of near-identical boilerplate), re-inflating one posting
  * list. That worst case is inherent to any exact algorithm — the
  * data really does contain ~all-pairs matches then; AQE's skew-join
  * split keeps the tasks balanced, and callers wanting a bound should
  * pre-dedup exact copies (Dedup.exact), which removes exactly the
  * pathological mass.
  */
object AllPairsJoin {

  /** All (id_a < id_b) pairs of `sets` (idCol, setCol: array of
    * distinct tokens) with Jaccard ≥ tauNum/tauDen. Output:
    * (id_a, id_b, inter, uni, jac_micro). */
  def jaccardSelfJoin(sets: DataFrame, idCol: String, setCol: String,
                      tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen >= tauNum,
      s"threshold must be in (0, 1], got $tauNum/$tauDen")
    // defensive distinct: |A∩B| + the sz-based union formula are only
    // correct over sets — a caller passing raw token lists would
    // silently inflate sizes otherwise
    // r20 measured-and-rejected: persisting this frame (the
    // substringSpans pin discipline) to share it across its three
    // consumers REGRESSED the steady-state 3× at sf0.1 — an
    // InMemoryRelation of array-of-string columns costs more to re-read
    // (columnar batch decode + GC: ~5 s of GC per consumer stage in the
    // profile) than the wordShingles kernel costs to recompute. The
    // sets stay recomputed per consumer; callers parallelize the
    // recomputation by spreading the input (Tables.spreadForCompute)
    // BEFORE computing setCol.
    val base = sets
      .select(col(idCol).cast("long").as("id"),
        array_distinct(col(setCol)).as("s"))
      .filter(size(col("s")) > 0)
      .withColumn("sz", size(col("s")))
    val tok = base.select(col("id"), col("sz"), explode(col("s")).as("tok"))
    val df = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // Prefix length p = sz − ceil(τ·sz) + 1, ceil in integer form.
    // BIGINT arithmetic (r15 review): micro-unit thresholds are this
    // codebase's idiom (τ = 700000/1000000), and tauNum · sz in 32-bit
    // wraps negative at sz ≈ 3000 under non-ANSI Spark — silently
    // shrinking the prefix and dropping true pairs from an EXACT join.
    val p = (col("sz") - expr(
      s"(cast($tauNum as bigint) * sz + ${tauDen - 1}) div $tauDen") + lit(1))
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("tok"))
    val prefix = tok.join(df, "tok")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= p)
      .select(col("id"), col("sz"), col("tok"))
    // size filter (Bayardo §3.1, lossless): J(A,B) ≤ min(|A|,|B|) /
    // max(|A|,|B|) — an int column rides the prefix shuffle and prunes
    // size-incompatible candidates INSIDE the posting-list join, before
    // the distinct and the two doc-array fetch joins pay for them
    // (measured at sf0.1 / τ=0.7: 202,477 → 104,502 candidates, −48%)
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")).cast("long") * tauDen >=
            greatest(col("a.sz"), col("b.sz")).cast("long") * tauNum)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // verification inputs sort ONCE per doc scan (the tok/prefix branch
    // stays unsorted — it only explodes), converting each per-pair
    // verification from array_intersect's hash-set build into
    // SortedIntersectSize's allocation-free two-pointer merge
    // (Bayardo §3's sorted-list verification)
    val sa = base.select(col("id").as("id_a"), sort_array(col("s")).as("s_a"),
      col("sz").as("sz_a"))
    val sb = base.select(col("id").as("id_b"), sort_array(col("s")).as("s_b"),
      col("sz").as("sz_b"))
    import org.apache.spark.sql.graft.ExprBridge
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("inter", ExprBridge.column(
        graft.expressions.SortedIntersectSize(
          ExprBridge.expression(col("s_a")), ExprBridge.expression(col("s_b")))))
      .withColumn("uni", (col("sz_a") + col("sz_b")).cast("long") - col("inter"))
      .filter(col("inter") * tauDen >= col("uni") * tauNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        expr("(inter * 1000000) div uni").as("jac_micro"))
  }
}
