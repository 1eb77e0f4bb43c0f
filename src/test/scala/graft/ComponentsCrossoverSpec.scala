package graft

import graft.tools.ComponentsCrossover

/** CI pin for the components-crossover receipt (VERDICT r14 ask #5):
  * the probe's two arms must agree exactly on the probe topology (the
  * artifact's timing claim is only meaningful over identical answers),
  * and the edge generator must actually produce the declared diameter
  * stressor — the r15 review found the first generator's "chain" branch
  * emitted only intra-block edges, so the spec now demands a ≥1000-node
  * component, which an all-small-blocks topology cannot fake. The sized
  * timing runs live in the SCALE_r15_components.json artifact, not CI.
  */
class ComponentsCrossoverSpec extends SparkSpec {

  test("probe arms agree exactly; topology has small blocks AND 1000-node chains") {
    // chainEvery=2000 scales the stressor stripes down to spec size
    val pairs = ComponentsCrossover.edgeSet(spark, 20000L, chainEvery = 2000L)
    val drv = graft.operators.Dedup.connectedComponents(pairs,
        driverEdgeLimit = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = graft.operators.Dedup.connectedComponents(pairs,
        driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drv === dist, "driver union-find and min-label labelings diverge")
    val sizes = drv.groupBy(_._2).map(_._2.size)
    assert(sizes.max >= 1000,
      s"diameter stressor missing: largest component ${sizes.max} < 1000")
    assert(sizes.count(_ <= 6) > 1000,
      "topology must be dominated by small star blocks")
  }

  test("edgeSet is deterministic; probe reports ACTUAL edge counts") {
    val e1 = ComponentsCrossover.edgeSet(spark, 5000L, chainEvery = 2000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val e2 = ComponentsCrossover.edgeSet(spark, 5000L, chainEvery = 2000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(e1 === e2)
    // the default-period generator at probe scale: the artifact's edge
    // field must be the materialized count (self-loops dropped), which
    // is strictly below the requested range size
    val arms = ComponentsCrossover.probe(spark, Seq(20000L))
    assert(arms.map(_.topology).toSet === Set("chain", "flat"),
      "probe must measure both topologies per size")
    arms.foreach { a =>
      assert(a.requested === 20000L)
      assert(a.edges < 20000L && a.edges > 15000L,
        s"actual edge count ${a.edges} out of the expected band (${a.topology})")
    }
  }
}
