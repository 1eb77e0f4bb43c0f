package graft

/** Plan-shape regression harness (VERDICT r4 item 4): walks EVERY
  * registered query and pins the physical-plan properties that
  * BENCH_NOTES previously proved by hand, so a future change can't
  * silently regress them:
  *
  *  - no `CartesianProduct` anywhere (the labeled brute-force baselines
  *    are broadcast nested-loop joins, never a shuffled cartesian);
  *  - shuffle joins (SortMergeJoin/ShuffledHashJoin) only where the two
  *    sides are genuinely comparable-size — every dimension join must
  *    broadcast. Budgets pin today's counts; a new shuffle join in any
  *    other query fails the suite;
  *  - broadcast nested-loop joins only in the queries that legitimately
  *    carry one (cross products over tiny dims, broadcast top-k scoring);
  *  - `PushedFilters` stays non-empty on the scans that today push their
  *    predicates into parquet;
  *  - whole-stage codegen covers the fused custom-Expression kernels
  *    (asserted on the executed AQE-final plan — planning-time explain
  *    hides codegen annotation under AQE).
  *
  * Budgets are from the round-5 audit at sf0.001 (`graft.PlanAudit`).
  * If a legitimate change shifts a count, re-run PlanAudit and update
  * the budget next to a comment explaining why the new shape is right.
  */
class PlanShapeSpec extends SparkSpec {

  // queries whose two join sides are comparable-size by design: the
  // full-outer reconciliation flagship (both sides are record streams),
  // the corpus pipeline's doc-to-doc joins, and IVF's cell-partitioned
  // probe join
  private val shuffleJoinBudget = Map(
    "audit_reconcile" -> 1,
    "audit_summary" -> 1,
    "corpus_pipeline_full" -> 3,
    "sim_topk_ivf" -> 1,
    "sim_topk_ivf_seeded" -> 1,
    // the executed auto-probe runs the same seeded machinery at the
    // planner-chosen depth
    "sim_topk_ivf_auto" -> 1,
    // the probe-plan sweep materializes eagerly (4-row result; its
    // shared brute checkpoint is freed on return), so the registered
    // plan is a LogicalRDD scan — the constituent join shapes remain
    // pinned through the registered sim_topk_brute / sim_topk_ivf_seeded
    // queries that use the same machinery lazily
    "sim_ivf_probe_plan" -> 0,
    // SemDeDup's within-cell self-join: both sides ARE the corpus,
    // repartitioned by cell — the O(n²/k) intra-cluster sweep
    "sim_semdedup" -> 1,
    // candidate pairs ⋈ split (×2 on id_a/id_b): the split relation is
    // documents-sized — corpus-keyed, NOT a broadcastable dim at scale —
    // so shuffle joins are the intended shape (at fixture scale Spark
    // broadcasts the capped pair side of the first, leaving one SMJ)
    "decontam_eval_overlap" -> 2,
    // docs ⋈ per-doc weights: both sides corpus-sized by design
    "text_importance_weights" -> 1,
    // docs ⋈ cell assignments: both sides corpus-sized by design
    "corpus_cluster_map" -> 1,
    // the capstone composes 4 corpus-keyed signal tables on doc_id
    // (survivors, perplexity, importance, mix) — all corpus-sized; at
    // scale they co-locate on the shared doc_id partitioning
    "curation_decisions" -> 4,
    // r7: the query-batch-sized PQ/mining sides (lut/short/qfull, the
    // %-split candidate lists) dropped their forced broadcast() hints
    // (VERDICT r6 what's-wrong 1) — the STATIC plan now shows SMJ for
    // those joins and AQE converts them to broadcast at runtime while
    // the batch is small (pinned by the AQE test below); at corpus-
    // growing batch sizes the SMJ is exactly the graceful degradation
    "sim_topk_pq" -> 1,
    "sim_topk_ivfpq" -> 2,
    "training_pairs_mined" -> 1,
    // r8 graph queries: every join side is node-sized (near-dup graph
    // nodes ≪ corpus). pagerank: the two post-checkpoint rounds ×
    // (contribs ⋈ edges + state ⋈ contribs). triangles: wedge + close
    // + final count join, plus the persisted oriented-edge subtree's
    // two degree-attach joins PRINTED once per InMemoryTableScan
    // reference (3×2 = 6 string matches for joins that execute once)
    "graph_pagerank" -> 4,
    // r11: perNode now materializes eagerly (checkpoint hygiene — the
    // deg/oriented pins are released before returning), so the
    // REGISTERED query's plan is one LogicalRDD scan with zero joins;
    // the wedge/close join shape is pinned on the lazy BUILDER plan in
    // the dedicated test below ("triangles BUILD plan…"), same pattern
    // as the near-dup signal BUILD pin. Historical context (r10): the
    // old lazy plan printed 9 join strings for 5 executed joins
    // (cached subtrees print once per InMemoryTableScan reference).
    "graph_triangles" -> 0,
    // r9: the snapshot↔latest-changes merge is a FULL-outer equi-join,
    // which no broadcast strategy supports — one shuffle join is the
    // correct (and minimal) shape; the changelog side has already been
    // collapsed to |distinct keys| by the max_by aggregate
    "cdc_merge_snapshot" -> 1,
    // same full-outer merge, latest side = the streamed compacted state
    "cdc_merge_streamed" -> 1,
    // r9 TPC-H Q8: the one big-big core (lineitem ⋈ orders on orderkey);
    // every dim side broadcasts
    "q8_market_share" -> 1,
    // r10: the advise→salt→join demo PINS the shuffled path (merge
    // hint) because its whole subject is the non-broadcastable-dim
    // regime — a broadcast would optimize the salting away
    "advised_salted_join" -> 1
  ).withDefaultValue(0)

  // legitimate broadcast nested-loop joins: tiny-dim cross products and
  // the broadcast-queries top-k scorers (the labeled brute baselines)
  private val bnljBudget = Map(
    "cross_join" -> 1,
    "histogram_values" -> 1,
    "sim_neardup_exact_check" -> 1,
    "sim_topk_agg" -> 1,
    "sim_topk_brute" -> 1,
    // eager 4-row materialization (see shuffleJoinBudget note): the
    // registered plan carries no joins; the arms' BNLJ shapes stay
    // pinned via sim_topk_brute / sim_topk_ivf_seeded
    "sim_ivf_probe_plan" -> 0,
    "sim_topk_ivf" -> 2,
    "sim_topk_ivf_seeded" -> 2,
    "sim_topk_ivf_auto" -> 2,
    "text_tfidf" -> 1,
    // Lloyd assign passes: corpus × broadcast 16-row centroid table
    "sim_semdedup" -> 2,
    // corpus × broadcast 1-row totals (same shape as text_tfidf's N join)
    "text_importance_weights" -> 1,
    // 4-row plan × broadcast 1-row max-survivors scalar (the coverage
    // threshold for the prescriptive window choice)
    "dedup_snm_autowindow" -> 1,
    // LM × broadcast 1-row smoothing-vocabulary count
    "text_perplexity_buckets" -> 1,
    // Lloyd assign passes: corpus × broadcast 16-row centroid table
    "corpus_cluster_map" -> 2,
    // IVF-PQ cell probe: queries × broadcast 16-row centroid table
    "sim_topk_ivfpq" -> 1,
    // labels² pairwise centroid join (≤ dozens of rows a side)
    "source_centroid_sim" -> 1,
    // two 1-row (n_docs, sum_dl) stats broadcasts: onto the term dict
    // (idf) and onto the doc-length table (dnorm)
    "text_bm25_topk" -> 2,
    // the two BM25 stats broadcasts + the labeled brute-cosine arm
    "search_hybrid_rrf" -> 3,
    // two BM25 stats broadcasts + the positive arm's brute-cosine scan
    "training_pairs_mined" -> 3,
    // 1-row broadcasts inside the composed signals: DSIR totals,
    // decimal-mean totals, LM smoothing vocabulary, plus the final
    // corpus × 1-row mean join
    "curation_decisions" -> 4,
    // events × broadcast 1-row global min/max bounds for quantization
    "layout_zorder_tiles" -> 1,
    // corpus × broadcast 1-row token-budget scalar
    "budget_select_tokens" -> 1,
    // r8: orders × broadcast 1-row as-of (corpus max date) scalar
    "orders_rfm" -> 1,
    // r8: seven 1-row × 1-row cross joins (per-FK-edge row count ×
    // orphan count); the containment checks themselves are anti-joins
    "audit_referential" -> 7,
    // r9 TPC-H scalar subqueries: per-part values × broadcast 1-row
    // scoped total (Q11) / customers × broadcast 1-row avg balance (Q22)
    "q11_important_parts" -> 1,
    "q22_sales_opportunity" -> 1,
    // r10 sketch bracket: per-type counts × broadcast 1-row corpus
    // total (the heavy-hitter support threshold)
    "freq_items" -> 1
  ).withDefaultValue(0)

  // floor of parquet scans with non-empty PushedFilters per query (from
  // the audit) — a refactor that stops a predicate reaching the scan
  // drops below the floor and fails
  private val pushedFloor = Map(
    "asof_join" -> 1, "audit_reconcile" -> 1, "audit_summary" -> 1,
    "cohort_retention" -> 2, "cube_agg" -> 2, "curation_report" -> 2,
    "filter_project" -> 1, "funnel_conversion" -> 2, "join_anti" -> 1,
    "join_inner" -> 3, "join_left_outer" -> 1, "join_right_outer" -> 1,
    "join_semi" -> 2, "mm_frame_tasks" -> 1, "part_promo_revenue" -> 2,
    "pivot_segments" -> 2, "q1_pricing_summary" -> 1, "range_join" -> 1,
    "rollup_agg" -> 3, "salted_join" -> 2, "session_window" -> 1,
    "sim_knn_join_lsh" -> 2, "sim_neardup_exact_check" -> 2,
    // sim_neardup_lsh dropped off this map in r9: the registered query
    // is now a probe of the memoized sim_neardup_pairs SIGNAL (a
    // localCheckpoint / written table — no parquet rescan to push
    // into); the BUILD plan's pushdown floor is pinned separately below
    // ("near-dup pair signal BUILD keeps its parquet pushdown")
    "sim_topk_agg" -> 2, "sim_topk_brute" -> 2,
    // sim_topk_ivf dropped 2 → 1: the corpus side now comes from the
    // memoized localCheckpoint'd Lloyd assignments (no parquet rescan);
    // only the query-subset scan keeps its pushed predicate
    "sim_topk_ivf" -> 1, "sim_topk_ivf_seeded" -> 2, "sim_topk_lsh" -> 4,
    "sliding_window" -> 1, "smt_transform" -> 1, "sql_exists_subquery" -> 1,
    "text_contamination" -> 2, "tumbling_window" -> 1,
    // r8 funnel: three step scans each push their event_type equality
    // into parquet (the fourth, lifetime-count scan reads user_id only)
    "events_sequence_match" -> 3,
    // agg_incremental_merge dropped off this map in r14: the two
    // filtered-scan arms (each pushing its half-split predicate) were
    // replaced by ONE unfiltered scan grouped by (flag, half) — the
    // partial states now come from the group-by, so there is no
    // predicate to push and the fact table is read once, not twice
    // r9 TPC-H shapes: every scan keeps its dim/date predicate
    "q3_shipping_priority" -> 3, "q5_local_supplier_volume" -> 6,
    "q10_returned_items" -> 4, "q18_large_volume_customer" -> 4,
    // r9 SQL shapes: decorrelated subqueries keep join-key IsNotNull
    // predicates at their scans
    "sql_correlated_scalar" -> 2, "sql_lateral_topn" -> 1,
    // r9 TPC-H battery (PlanAudit sf0.001): every scan keeps its
    // dim/date/flag predicate in parquet
    "q2_min_cost_supplier" -> 7, "q4_order_priority" -> 2,
    // Q6 is ALL pushdown by design: one scan, four range predicates
    "q6_forecast_revenue" -> 1,
    "q7_nation_volume" -> 6, "q8_market_share" -> 8,
    "q9_product_profit" -> 5, "q11_important_parts" -> 8,
    "q13_customer_distribution" -> 1, "q15_top_supplier" -> 3,
    "q16_supplier_cnt" -> 3, "q17_small_qty_revenue" -> 4,
    "q19_disjunctive_revenue" -> 2, "q21_waiting_supplier" -> 5,
    "q22_sales_opportunity" -> 3,
    // r10 topology closers, floored in r11: Q12 pushes its shipmode/
    // date-window range into lineitem (+ IsNotNull keys); Q20's nested
    // semi chain keeps the color prefix, date window, and key
    // null-guards at their scans
    "q12_ship_priority" -> 2, "q20_potential_promotion" -> 6)

  // fused custom-Expression kernels + representative scan/agg shapes that
  // must stay inside whole-stage codegen
  private val codegenQueries = Seq(
    "q1_pricing_summary", "filter_project", "smt_transform", "mask_pii",
    "text_winnowing", "text_fingerprint", "text_bigrams", "text_quality",
    "dedup_minhash_pairs", "dedup_simhash_md5_pairs")

  /** Queries whose frame CONSTRUCTION runs eager jobs, so plan-only
    * audits must skip them (ADVICE r9): `pipeline_observe_metrics`
    * materializes a noop write to harvest its Observation and returns a
    * LocalRelation — its "plan" is trivially empty while building it
    * pays a full lineitem scan; the streamed queries run their whole
    * stream at construction for the same reason; `advised_salted_join`
    * runs two sketch jobs (the advise pass) but DOES return a real plan,
    * so it stays in — only the observe harvest has nothing to audit. */
  private val eagerNoPlan = Set("pipeline_observe_metrics")

  /** Plans (initial physical + formatted explain) for every registered
    * query, built once and shared by the assertions below. */
  private lazy val plans: Map[String, (String, String)] = {
    val formatted = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    SparkEntry.queries.keys.toSeq.sorted.filterNot(eagerNoPlan).map { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      n -> (df.queryExecution.executedPlan.toString,
        df.queryExecution.explainString(formatted))
    }.toMap
  }

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("no query plans a CartesianProduct") {
    val offenders = plans.collect {
      case (n, (plan, _)) if plan.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian products appeared in: $offenders")
  }

  test("shuffle joins only where both sides are comparable-size (dims broadcast)") {
    val over = plans.toSeq.sortBy(_._1).flatMap { case (n, (plan, _)) =>
      val got = count(plan, "SortMergeJoin") + count(plan, "ShuffledHashJoin")
      if (got > shuffleJoinBudget(n)) Some(s"$n: $got > ${shuffleJoinBudget(n)}")
      else None
    }
    assert(over.isEmpty,
      s"shuffle-join budget exceeded (new non-broadcast join?): $over")
  }

  test("broadcast nested-loop joins only in the labeled cross/brute queries") {
    val over = plans.toSeq.sortBy(_._1).flatMap { case (n, (plan, _)) =>
      val got = count(plan, "BroadcastNestedLoopJoin")
      if (got > bnljBudget(n)) Some(s"$n: $got > ${bnljBudget(n)}") else None
    }
    assert(over.isEmpty, s"unexpected nested-loop join: $over")
  }

  test("predicates keep reaching the parquet scans (PushedFilters non-empty)") {
    val pushedRe = """PushedFilters: \[([^\]]*)\]""".r
    val under = pushedFloor.toSeq.sortBy(_._1).flatMap { case (n, floor) =>
      val got = pushedRe.findAllMatchIn(plans(n)._2).count(_.group(1).trim.nonEmpty)
      if (got < floor) Some(s"$n: $got < $floor") else None
    }
    assert(under.isEmpty, s"pushdown regressed: $under")
  }

  test("near-dup pair signal BUILD keeps its parquet pushdown") {
    // the registered sim_neardup_lsh/_clusters queries probe the
    // memoized signal; the scan-side pushdown they used to pin lives in
    // the signal's BUILDER plan, asserted here directly so a pushdown
    // regression in the banding pipeline still fails the suite
    val build = graft.operators.Similarity.nearDupPairsLsh(
      graft.sources.Tables.embeddings(spark, sf), "vec_id", "embedding",
      threshold = 0.4, md5Planes = true, maxCandidatePairs = Some(4000000L))
    val formatted = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    val pushedRe = """PushedFilters: \[([^\]]*)\]""".r
    val got = pushedRe.findAllMatchIn(build.queryExecution.explainString(formatted))
      .count(_.group(1).trim.nonEmpty)
    assert(got >= 2, s"near-dup build pushdown regressed: $got < 2")
  }

  test("triangles BUILD plan keeps its degree-ordered join shape") {
    // the registered graph_triangles query materializes eagerly (its
    // plan is a LogicalRDD scan), so the wedge/close shape is pinned on
    // the lazy builder plan: 3 executed hash joins (wedge leg pair +
    // closing probe + final degree attach) over the two persisted
    // subtrees, whose own joins print once per InMemoryTableScan
    // reference — budget the historical 9-string ceiling and forbid
    // cartesian products outright
    val (build, pins) = graft.operators.Triangles.perNodePlan(
      graft.queries.DedupQueries.neardupPairs(spark, sf), "id_a", "id_b")
    try {
      val plan = build.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"))
      val joins = count(plan, "SortMergeJoin") + count(plan, "ShuffledHashJoin") +
        count(plan, "BroadcastHashJoin")
      assert(joins >= 3, s"triangles build lost its join structure: $joins < 3")
      assert(joins <= 9, s"triangles build grew extra joins: $joins > 9")
    } finally pins.foreach(_.unpersist(true))
  }

  test("no forced broadcast hints on query-batch-sized sides (r7 degrade)") {
    // VERDICT r6 what's-wrong 1: the PQ/mining/rerank family used to
    // force-broadcast sides that grow with the corpus under the
    // registered %-splits (a hint overrides autoBroadcastJoinThreshold
    // with no AQE escape). The hints are gone; the ONLY ResolvedHints
    // left in these analyzed plans are the model-sized ones (16-row
    // centroid tables, m·k-row codebooks). Someone re-adding a forced
    // broadcast on a query-derived side bumps the count and fails here.
    // (At fixture scale the runtime keeps SMJs for these joins because
    // their output partitioning feeds the query_id windows — reusing
    // the join shuffle for the window beats broadcast-plus-reshuffle,
    // which is the optimizer doing its job, not a missed broadcast.)
    val hintBudget = Map(
      "sim_topk_pq" -> 2,        // broadcast(cb) ×2 (encode + LUT): the m·k-row codebook
      "sim_topk_ivfpq" -> 2,     // broadcast(cents) + broadcast(cb)
      "training_pairs_mined" -> 0,
      "search_bm25_rerank" -> 0,
      "search_hybrid_rrf" -> 0)
    val over = hintBudget.toSeq.sortBy(_._1).flatMap { case (n, budget) =>
      val got = count(
        SparkEntry.queries(n)(spark, sf).queryExecution.analyzed.toString,
        "ResolvedHint")
      if (got > budget) Some(s"$n: $got > $budget") else None
    }
    assert(over.isEmpty, s"forced broadcast hint re-introduced: $over")
  }

  test("whole-stage codegen spans the fused kernels (executed AQE-final plans)") {
    val starRe = """\*\(\d+\)""".r
    val missing = codegenQueries.flatMap { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      df.collect() // drive AQE to its final plan; codegen markers appear
      val plan = df.queryExecution.executedPlan.toString
      val spans = starRe.findAllIn(plan).toSeq.distinct.size
      if (spans < 1) Some(s"$n: no codegen span") else None
    }
    assert(missing.isEmpty, s"codegen coverage regressed: $missing")
  }
}
