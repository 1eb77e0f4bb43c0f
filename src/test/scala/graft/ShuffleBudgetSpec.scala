package graft

import graft.tools.ShuffleAudit

/** Quantitative shuffle-VOLUME regression gate — the companion to
  * PlanShapeSpec's operator-count budgets. Two plans with identical
  * shapes can differ 10× in exchanged bytes (a dropped pre-shuffle
  * projection, a filter that slid above its exchange, a widened
  * aggregation key); at 100 TB exchanged bytes are the cost model, so
  * each representative query's executed-plan shuffle write volume is
  * pinned to a budget ≈ 2.5× its measured sf0.001 value (headroom for
  * partition-count jitter, not for regressions — a doubled exchange
  * blows straight through).
  *
  * Budgets from `runMain graft.tools.ShuffleAudit /root/testdata/sf0.001
  * <queries>`; if a legitimate change shifts one, re-measure and update
  * the budget next to a comment saying why the new volume is right.
  */
class ShuffleBudgetSpec extends SparkSpec {

  // (byte budget, measured bytes at audit time) — representative heavy
  // hitters across join/agg/window/dedup/pack/asof families
  private val budgets: Map[String, (Long, Long)] = Map(
    "q1_pricing_summary" -> (4000L, 1462L),
    "q3_shipping_priority" -> (12000L, 4705L),
    "q5_local_supplier_volume" -> (2000L, 102L),
    "q8_market_share" -> (65000L, 26146L),
    "q18_large_volume_customer" -> (68000L, 27092L),
    "q13_customer_distribution" -> (8500L, 3249L),
    "q21_waiting_supplier" -> (330000L, 129631L),
    "audit_reconcile" -> (30000L, 11281L),
    "dedup_exact" -> (110000L, 43484L),
    "dedup_minhash_pairs" -> (220000L, 86405L),
    "cube_agg" -> (8000L, 3155L),
    "window_rank" -> (17000L, 6784L),
    "corpus_pack_windows" -> (110000L, 42340L),
    "asof_join" -> (120000L, 48087L),
    "budget_select_tokens" -> (50000L, 19763L),
    // r9 window analytics: ONE user_id exchange carries the events
    // rows; everything downstream is frame-local or broadcast-sized
    "events_anomaly_zscore" -> (60000L, 23685L),
    "events_attribution" -> (56000L, 22078L),
    "events_markov_transitions" -> (56000L, 21995L),
    // Q6 is the pure-pushdown receipt: the only exchange is the
    // single-row final aggregate
    "q6_forecast_revenue" -> (200L, 79L),
    // r12 prescriptive planners (audited at local[4] sf0.001): the
    // choice/plan relations probe MEMOIZED plan tables, so their
    // executed plans exchange almost nothing (the sweep cost is the
    // signal build — same accounting as every memoized signal); the
    // EXECUTED auto-probe path carries the real seeded-IVF volume
    "sim_topk_ivf_auto" -> (370000L, 146763L),
    "dedup_snm_autowindow" -> (200L, 59L),
    "sim_lsh_bucket_plan" -> (1500L, 598L),
    "dedup_snm_window_plan" -> (700L, 272L),
    // typed cogroup: both key-projected sides co-partition (orders +
    // lineitem rows) plus the ordered-output range exchange
    "audit_cogroup_diff" -> (350000L, 138914L),
    // r11 additions (audited at local[8] sf0.001): the r10 TPC-H
    // topology closers — Q12's date-window join carries 4 partial-agg
    // rows, Q20's nested semi-chain stays broadcast-dominated
    "q12_ship_priority" -> (800L, 300L),
    "q20_potential_promotion" -> (12000L, 4577L),
    // SNM: rank range exchange + bucket equi-shuffle per pass + the
    // ids-width cross-pass distinct (string-free, pinned below)
    "dedup_levenshtein_block" -> (55000L, 21100L),
    "dedup_snm_multipass" -> (200000L, 77281L),
    // advise→salt→join: sketch pass shuffles nothing (CMS aggregates
    // map-side); the salted join + per-user agg carry the volume
    "advised_salted_join" -> (45000L, 17934L),
    // graph family: node-sized state rounds (pagerank), one frontier
    // exchange (bfs), builder-materialized scan + order (triangles)
    "graph_pagerank" -> (15000L, 5850L),
    "graph_bfs_hops" -> (3500L, 1261L),
    "graph_triangles" -> (6500L, 2433L))

  test("executed-plan shuffle write volume stays inside per-query budgets") {
    val over = budgets.toSeq.sortBy(_._1).flatMap { case (name, (budget, measured)) =>
      val v = ShuffleAudit.measure(SparkEntry.queries(name)(spark, sf))
      if (v.shuffleBytes > budget)
        Some(s"$name: ${v.shuffleBytes} B > $budget B (was $measured B at audit)")
      else None
    }
    // These are RE-MEASURE-ON-UPGRADE budgets, not invariants: absolute
    // shuffle bytes move with Spark version, shuffle codec, and
    // partition-count defaults. On a failure, first decide whether the
    // PLAN regressed (an extra exchange, a lost broadcast — fix the
    // plan) or only the encoding moved (same exchanges, new byte count —
    // re-measure via `runMain graft.tools.ShuffleAudit` and update the
    // budget with a comment saying why the new volume is right).
    assert(over.isEmpty,
      s"shuffle volume over budget: $over — if the plan shape is unchanged " +
        "(same exchanges in .explain), re-measure with graft.tools.ShuffleAudit " +
        "and update the budget; only treat as a regression if an exchange " +
        "appeared or a broadcast was lost")
  }

  test("broadcast-only TPC-H plans exchange almost nothing (Q5 ≤ 2 KB)") {
    // the strongest single receipt: a 6-way snowflake join whose ONLY
    // shuffle is the final 1-row-per-nation aggregate — everything else
    // broadcasts, so exchanged volume is independent of fact-table size
    val v = ShuffleAudit.measure(
      SparkEntry.queries("q5_local_supplier_volume")(spark, sf))
    assert(v.shuffleBytes <= 2000,
      s"Q5 should shuffle only its tiny final aggregate, got ${v.shuffleBytes} B")
    assert(v.shuffleExchanges <= 2,
      s"Q5 should have at most its aggregate exchanges, got ${v.shuffleExchanges}")
  }

  test("snm multipass cross-pass exchanges carry ints only — no name payloads") {
    // VERDICT r10 what's-wrong #3: the cross-pass distinct used to
    // shuffle (id_a, id_b, name_a, name_b); the names are functionally
    // determined by the ids, so the distinct (and the final order-by)
    // must exchange ints alone. Names still flow in the exchanges BELOW
    // the union (candidate generation needs them for the Levenshtein),
    // so the pin is scoped to exchanges whose subtree contains the
    // cross-pass union.
    import org.apache.spark.sql.execution.UnionExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.StringType
    val df = SparkEntry.queries("dedup_snm_multipass")(spark, sf)
    df.collect()
    val nodes = ShuffleAudit.flatten(df.queryExecution.executedPlan)
    val aboveUnion = nodes.collect {
      case s: ShuffleExchangeLike
        if ShuffleAudit.flatten(s).exists(_.isInstanceOf[UnionExec]) => s
    }
    assert(aboveUnion.nonEmpty, "expected exchanges above the cross-pass union")
    val stringy = aboveUnion.filter(_.schema.exists(_.dataType == StringType))
    assert(stringy.isEmpty,
      s"cross-pass exchanges must be ids-width (ints only), got schemas: " +
        stringy.map(_.schema.simpleString).mkString("; "))
  }

  test("Q6 exchanges exactly one aggregate row — scan-side cost only") {
    // the scan-dominated extreme: every predicate in PushedFilters
    // (PlanShapeSpec pins that) and the lone exchange carries the
    // single partial-aggregate row, so exchanged volume is CONSTANT in
    // fact-table size — the plan a 100 TB Q6 needs
    val v = ShuffleAudit.measure(
      SparkEntry.queries("q6_forecast_revenue")(spark, sf))
    assert(v.shuffleRows <= 32,
      s"Q6 should exchange only partial-aggregate rows, got ${v.shuffleRows}")
    assert(v.shuffleExchanges <= 1,
      s"Q6 should have one final-aggregate exchange, got ${v.shuffleExchanges}")
  }
}
