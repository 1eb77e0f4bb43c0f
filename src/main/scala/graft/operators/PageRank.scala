package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank (Page et al. 1999) in exact integer
  * arithmetic — link-graph centrality as a sequence of declarative
  * join+aggregate rounds, engine-reproducible to the last unit.
  *
  * The reference pipeline (dotsering/kafka-connect-minio-pipeline) has
  * no graph operator; this extends the curation surface the way the
  * connected-components clusterer does — over the near-dup pair graph
  * it scores how CENTRAL a document is inside its duplication
  * neighborhood (template/boilerplate hubs rank high), a standard
  * quality prior for corpus curation.
  *
  * Determinism: ranks are integer micro-units of a fixed total mass.
  * Every step is integer division (`div`, truncating — all values
  * non-negative so it equals floor) and integer sums, so aggregation
  * order cannot drift a single unit and a DuckDB oracle replays the
  * identical unrolled iteration chain.
  *
  * Scale: each iteration is ONE shuffle — contributions group by
  * destination on the edge table's hash partitioning; the rank state
  * is node-sized, never corpus-sized. Lineage is truncated by an eager
  * `localCheckpoint` every `checkpointCadence` iterations (same
  * pattern as [[Dedup.connectedComponents]]' distributed loop), so a
  * 50-iteration run plans each round against a materialized table
  * instead of a 50-join tree. Dangling mass: nodes appear in the state
  * iff they have out-edges (an undirected near-dup graph symmetrized
  * to both directions has none dangling); callers with true sinks
  * should symmetrize or pre-drop them.
  */
object PageRank {

  /** Rank every node of `edges` (directed (src, dst) pairs; pass both
    * directions for an undirected graph) after `iterations` damped
    * rounds. Output: (node, deg, rank_micro), total mass ≈ `massMicro`
    * with truncation dust. Damping 0.85 as (85, 15)/100 integer parts.
    */
  def ranks(edges: DataFrame, iterations: Int,
            massMicro: Long = 1000000000000L,
            checkpointCadence: Int = 4): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(checkpointCadence > 0,
      s"checkpointCadence must be > 0, got $checkpointCadence " +
        "(the modulo check divides by it; there is no 'off' value — " +
        "cadence >= iterations effectively disables checkpointing)")
    // null endpoints (or a non-numeric id the cast nulls) are excluded:
    // a null src otherwise mints a phantom node whose mass never flows,
    // and contributions to a null dst silently vanish — total mass
    // drifting below massMicro with no error
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    // Node state carries its out-degree so each round is state ⋈ edges
    // (one shuffle) instead of state ⋈ deg ⋈ edges.
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    // n is one aggregate scalar (bounded driver read, like Ivf's
    // probed-cell list); it becomes a plan literal in every round.
    val n = deg.count()
    if (n == 0) return deg.withColumn("rank_micro", lit(0L))
    val r0 = massMicro / n
    val base = (15L * r0) / 100L
    // handle-exact checkpoint hygiene ([[LocalCheckpoints]]): each
    // cadence checkpoint supersedes the previous one, whose blocks are
    // freed as soon as the new one is materialized — the loop pins at
    // most two rounds of node-sized state instead of one per cadence.
    // The FINAL checkpoint stays pinned (the returned lazy frame reads
    // it); node-sized, one per invocation.
    import LocalCheckpoints.{tracked, free}
    var (state, stateRdds) = tracked(deg.withColumn("rank_micro", lit(r0)))
    for (i <- 1 to iterations) {
      val contribs = state
        .select(col("node"), expr("rank_micro div deg").as("c"))
        .join(e, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("in_mass"))
      val next = state.drop("rank_micro")
        .join(contribs, state("node") === contribs("dst"), "left")
        .select(col("node"), col("deg"),
          (lit(base) + expr("(85 * coalesce(in_mass, 0L)) div 100"))
            .as("rank_micro"))
      // no checkpoint on the last round: the consumer's first action
      // materializes it anyway — an eager checkpoint there would just
      // run one extra job
      if (i % checkpointCadence == 0 && i != iterations) {
        val (ck, ckRdds) = tracked(next)
        free(stateRdds) // superseded: folded into the new checkpoint
        state = ck
        stateRdds = ckRdds
      } else state = next
    }
    state
  }
}
