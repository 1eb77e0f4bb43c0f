package graft

import graft.tools.ComponentsCrossover

/** CI pin for the components-crossover receipt (VERDICT r14 ask #5):
  * the probe's two arms must agree exactly on the probe topology (the
  * artifact's timing claim is only meaningful over identical answers),
  * and the edge generator must be deterministic and shaped as declared
  * (small chains + diameter stressors). The sized timing runs live in
  * the SCALE_r15_components.json artifact, not in CI.
  */
class ComponentsCrossoverSpec extends SparkSpec {

  test("probe arms agree exactly and topology is as declared (small scale)") {
    val arms = ComponentsCrossover.probe(spark, Seq(20000L))
    assert(arms.length === 1)
    val a = arms.head
    // probe() itself requires driver == distributed component counts;
    // re-assert the FULL labeling agrees, not just the count
    val pairs = ComponentsCrossover.edgeSet(spark, 20000L)
    val drv = graft.operators.Dedup.connectedComponents(pairs,
        driverEdgeLimit = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = graft.operators.Dedup.connectedComponents(pairs,
        driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drv === dist, "driver union-find and min-label labelings diverge")
    assert(a.components > 1000L, "topology must be dominated by small components")
  }

  test("edgeSet is deterministic and contains the long-chain stressors") {
    val e1 = ComponentsCrossover.edgeSet(spark, 5000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val e2 = ComponentsCrossover.edgeSet(spark, 5000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(e1 === e2)
    // every 20th id links consecutive ids of its 1000-block: a chain
    // edge like (1000k+i, 1000k+i+1) must exist
    assert(e1.exists { case (x, y) => y === x + 1 },
      "expected 1000-node chain edges in the stressor arm")
  }
}
