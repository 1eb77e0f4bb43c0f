package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, corpus dir) memo for materialized per-document SIGNAL
  * tables (perplexity scores, importance weights, Lloyd cells…): the
  * in-session analog of how a 100 TB curation run works — each signal
  * is computed once, written, and every consumer (the standalone query
  * AND the `curation_decisions` capstone) reads the materialized table
  * instead of recomputing the signal. `localCheckpoint` pins the
  * computed frame; a listener evicts a session's entries when it stops
  * so the static map never retains dead sessions (the bpeMemo pattern,
  * generalized). Builders must return a DETERMINISTIC frame — the memo
  * makes reuse, not semantics.
  */
object SignalMemo {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def cached(spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val key = (spark, dir, name)
    val hit = memo.get(key)
    if (hit != null) hit
    else {
      // build OUTSIDE the map op: signal builders nest (the bm25 probe
      // memo builds on the occ-index memo), and a nested
      // computeIfAbsent on the same ConcurrentHashMap throws
      // "Recursive update". A racing duplicate build is benign (both
      // are deterministic; putIfAbsent keeps the first).
      val built = build.localCheckpoint()
      val prev = memo.putIfAbsent(key, built)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          memo.keySet.removeIf(_._1 eq spark)
      })
      if (prev != null) prev else built
    }
  }
}
