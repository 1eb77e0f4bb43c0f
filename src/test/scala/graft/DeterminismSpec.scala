package graft

/** Partitioning invariance: registry results must be byte-identical
  * regardless of `spark.sql.shuffle.partitions` — the property that
  * makes the DuckDB hash gate meaningful and survives a cluster
  * re-size. Exercises the queries whose determinism is least free:
  * the exact-decimal typed aggregator, md5-ordered sampling/splits,
  * LSH candidate generation, and the driver-looped BPE learner.
  */
class DeterminismSpec extends SparkSpec {

  private def runWith(parts: Int, name: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (q <- Seq("agg_weighted_mean", "stratified_sample", "dataset_split",
      "dedup_minhash_pairs", "dedup_passages", "bpe_learn_merges",
      "scd2_history",
      // r8: integer PageRank rounds, the prefix-filtered exact join,
      // the range-partitioned distributed running sum, and the
      // priority draw — each with its own partitioning-sensitive step
      "graph_pagerank", "dedup_allpairs_jaccard", "budget_select_tokens",
      "sample_priority_weighted",
      // round 8: the greedy-earliest funnel (min-struct steps), RFM's
      // decimal-routed monetary sum, and the repeat-funnel's left range
      // join — each must not care how input rows land in partitions
      "events_sequence_match", "orders_rfm", "orders_repeat_funnel"))
    test(s"$q is invariant to shuffle partitioning (3 vs 17)") {
      assert(runWith(3, q) === runWith(17, q))
    }
}
