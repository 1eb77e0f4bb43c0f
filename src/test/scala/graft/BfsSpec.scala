package graft

import graft.operators.Bfs

/** Bounded multi-source BFS on synthetic graphs — the shapes the
  * near-dup oracle graph never produces (its clusters are stars, so
  * hops > 1 don't occur there): chains that exercise real depth, the
  * depth cap, minimal-hop ties, and multi-source minima. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int) = {
    val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    Bfs.hops(sym, seeds.toDF("node"), maxHops).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("chain graph: hops count along the path and the depth cap truncates") {
    // 1-2-3-4-5-6 from seed 1 with maxHops=3: 5 and 6 are unreached
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)), Seq(1L), 3)
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3),
      s"chain hops wrong: $got")
  }

  test("a node reachable two ways lands at its MINIMAL hop") {
    // diamond: 1-2-4 and 1-3-4 plus long way 1-5-6-4; 4 must be hop 2
    val got = run(Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 4L),
      (1L, 5L), (5L, 6L), (6L, 4L)), Seq(1L), 3)
    assert(got(4L) === 2, s"diamond min-hop wrong: $got")
    assert(got(6L) === 2, s"side chain wrong: $got")
  }

  test("empty graph / empty seed set: empty result, not errors") {
    assert(run(Seq.empty[(Long, Long)], Seq.empty[Long], 3) === Map.empty)
    assert(run(Seq.empty[(Long, Long)], Seq(1L), 3) === Map(1L -> 0),
      "a seed with no edges is still at hop 0")
  }

  test("multi-source: every node takes the distance to its NEAREST seed") {
    // two seeds at the ends of a path 1..7; middle splits between them
    val edges = (1L to 6L).map(i => (i, i + 1))
    val got = run(edges, Seq(1L, 7L), 3)
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3,
      5L -> 2, 6L -> 1, 7L -> 0), s"multi-source hops wrong: $got")
  }
}
