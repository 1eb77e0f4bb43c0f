package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{AllPairsJoin, PageRank, RunningTotal}
import graft.queries.SamplingQueries

/** Laws for the round-8 scale operators: PageRank (mass conservation,
  * centrality ordering), the prefix-filtered all-pairs join (equality
  * with the brute-force join — the losslessness theorem), the
  * distributed running total (equality with the single-partition
  * window), and the sampling/sharding/budget queries' invariants. */
class ScaleOpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- PageRank ----

  private def edgesOf(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("pagerank: symmetric pair splits mass evenly, total mass conserved") {
    val r = PageRank.ranks(edgesOf((1L, 2L)), iterations = 5).collect()
    assert(r.length === 2)
    val ranks = r.map(_.getAs[Long]("rank_micro"))
    assert(ranks.distinct.length === 1)
    // truncation loses at most a few units per node per round
    val total = ranks.sum
    assert(total <= 1000000000000L && total > 1000000000000L - 1000L)
  }

  test("pagerank: star center out-ranks leaves") {
    val r = PageRank.ranks(edgesOf((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)),
        iterations = 10)
      .collect().map(x => x.getAs[Long]("node") -> x.getAs[Long]("rank_micro"))
      .toMap
    assert(r(0L) > r(1L))
    assert(Seq(1L, 2L, 3L, 4L).map(r).distinct.length === 1)
  }

  test("pagerank: zero iterations is the uniform prior; empty graph is empty") {
    val r0 = PageRank.ranks(edgesOf((1L, 2L), (2L, 3L)), iterations = 0)
      .collect().map(_.getAs[Long]("rank_micro")).toSeq
    assert(r0 === Seq.fill(3)(1000000000000L / 3))
    assert(PageRank.ranks(edgesOf(), iterations = 3).count() === 0)
  }

  test("pagerank: invariant under input repartitioning") {
    val e = edgesOf((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
    val a = PageRank.ranks(e, iterations = 7).orderBy("node").collect().toSeq
    val b = PageRank.ranks(e.repartition(7), iterations = 7)
      .orderBy("node").collect().toSeq
    assert(a === b)
  }

  // ---- Triangles ----

  private def bruteTriangles(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      a <- nodes; b <- nodes if a < b && es((a, b))
      c <- nodes if b < c && es((b, c)) && es((a, c))
    } yield (a, b, c)
    val counts = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, l) => n -> l.length.toLong }
    nodes.map(n => n -> counts.getOrElse(n, 0L)).toMap
  }

  test("triangles: equals brute force on clique, wedge-chain, and mixed graphs") {
    val graphs = Seq(
      // K4: every node in 3 triangles, lcc = 1
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)),
      // path: no triangles
      Seq((1L, 2L), (2L, 3L), (3L, 4L)),
      // two triangles sharing node 3 + a pendant
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L), (5L, 6L)))
    for (g <- graphs) {
      val got = graft.operators.Triangles.perNode(g.toDF("id_a", "id_b"))
        .collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("n_triangles")).toMap
      assert(got === bruteTriangles(g), s"mismatch on $g")
    }
  }

  test("triangles: re-invocation defers freeing — the prior frame survives its successor") {
    // ADVICE r12: the bare put-and-free invalidated the previously
    // returned frame the moment its successor landed. The two-generation
    // queue keeps it collectable until TWO successors land.
    val df = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val r1 = graft.operators.Triangles.perNode(df)
    val r2 = graft.operators.Triangles.perNode(df)
    // r1's localCheckpoint blocks must still exist (lineage is
    // truncated, so a freed checkpoint cannot be recomputed)
    assert(r1.collect().length === 3)
    assert(r2.collect().length === 3)
  }

  test("triangles: lcc is exact for the shared-node double triangle") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L))
    val rows = graft.operators.Triangles.perNode(g.toDF("id_a", "id_b"))
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("lcc_micro"))).toMap
    // node 3: deg 4, 2 closed of 6 wedges → 2/6 = 0.333333
    assert(rows(3L) === ((4L, 333333L)))
    // corner nodes: deg 2, their single wedge closed → 1.0
    assert(rows(1L) === ((2L, 1000000L)))
  }

  // ---- AllPairsJoin ----

  private def bruteJaccard(sets: Seq[(Long, Seq[String])], tauNum: Int,
                           tauDen: Int): Set[(Long, Long, Long, Long)] =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size.toLong
      uni = sa.toSet.union(sb.toSet).size.toLong
      if inter * tauDen >= uni * tauNum
    } yield (ia, ib, inter, uni)).toSet

  test("allpairs: equals the brute-force join, including the exact-τ boundary") {
    // docs 1/2 share 7 of (8 ∪ 9) distinct tokens → J = 7/10 exactly;
    // 3 is a near-copy of 1; 4 shares only sub-threshold mass; 5 disjoint
    val sets = Seq(
      1L -> (1 to 8).map(i => s"t$i"),
      2L -> ((1 to 7).map(i => s"t$i") ++ Seq("x1", "x2")),
      3L -> (1 to 8).map(i => s"t$i"),
      4L -> (Seq("t1", "t2") ++ (1 to 6).map(i => s"y$i")),
      5L -> (1 to 5).map(i => s"z$i"))
    val df = sets.toDF("doc_id", "s")
    val got = AllPairsJoin.jaccardSelfJoin(df, "doc_id", "s", 7, 10)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet
    assert(got === bruteJaccard(sets, 7, 10))
    assert(got.contains((1L, 2L, 7L, 10L))) // the boundary pair survives
    assert(got.contains((1L, 3L, 8L, 8L)))
  }

  test("allpairs: lossless across thresholds and partitionings") {
    // deterministic synthetic corpus with overlapping token blocks
    val sets = (0L until 40L).map { i =>
      i -> (0 until 12).map(j => s"w${(i * 5 + j * 7) % 60}")
        .distinct
    }
    val df = sets.toDF("doc_id", "s").repartition(7)
    for ((tn, td) <- Seq((7, 10), (1, 2), (9, 10))) {
      val got = AllPairsJoin.jaccardSelfJoin(df, "doc_id", "s", tn, td)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet
      assert(got === bruteJaccard(sets.map { case (i, s) => i -> s.toSeq }, tn, td),
        s"mismatch at tau=$tn/$td")
    }
  }

  test("allpairs: the size filter is exactly tight at the threshold boundary (r15)") {
    // J(A,B) ≤ min/max: the filter prunes on sizes alone, so the
    // boundary case min/max == τ (A ⊂ B, |A|=7, |B|=10, τ=7/10) MUST
    // survive it and verify — an off-by-one (> for >=) would silently
    // drop exactly the full-containment pairs at the threshold
    val toks = (1 to 10).map(i => s"t$i")
    val sets = Seq(
      1L -> toks.take(7),          // A ⊂ B, J = 7/10 == τ -> kept
      2L -> toks,                  // B
      3L -> toks.take(6),          // C ⊂ B, J = 6/10 < τ  -> pruned by size alone
      4L -> (toks.take(7) ++ Seq("u1", "u2", "u3"))) // |D|=10, J(A,D)=7/10
    val got = AllPairsJoin.jaccardSelfJoin(sets.toDF("doc_id", "s"), "doc_id", "s", 7, 10)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet
    assert(got === bruteJaccard(sets.map { case (i, s) => i -> s.toSeq }, 7, 10))
    assert(got.contains((1L, 2L, 7L, 10L)), "min/max == τ containment pair must survive")
    assert(got.contains((1L, 4L, 7L, 10L)))
    // C (6 tokens) vs the 10-token docs: min/max = 6/10 < τ — pruned by
    // size alone; C–A (6/7 ≥ τ) still passes the filter and verifies
    assert(got.contains((1L, 3L, 6L, 7L)))
    assert(!got.exists(p => (p._1 == 3L && p._2 != 1L) || p._2 == 3L && p._1 != 1L))
  }

  test("allpairs: micro-unit thresholds survive 32-bit overflow on big sets (r15 review)") {
    // τ = 700000/1000000 is the codebase's micro-unit idiom; with a
    // 3000-token doc, sz·tauDen = 3·10⁹ wraps negative in Int — the old
    // arithmetic silently shrank the prefix AND failed the size filter,
    // dropping a J=1.0 pair from an operator documented as EXACT
    val big = (0 until 3000).map(i => s"t$i")
    val sets = Seq(1L -> big, 2L -> big, 3L -> big.take(10))
    val got = AllPairsJoin.jaccardSelfJoin(
        sets.toDF("doc_id", "s"), "doc_id", "s", 700000, 1000000)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet
    assert(got === Set((1L, 2L, 3000L, 3000L)),
      "the identical 3000-token pair must survive micro-unit τ arithmetic")
  }

  test("allpairs: duplicate tokens in the input are deduped; empty input is empty") {
    val dup = Seq(1L -> Seq("a", "a", "b", "b"), 2L -> Seq("a", "b", "b", "c"))
      .toDF("doc_id", "s")
    val got = AllPairsJoin.jaccardSelfJoin(dup, "doc_id", "s", 1, 2).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("inter") === 2L) // {a,b} ∩ {a,b,c}
    assert(got.head.getAs[Long]("uni") === 3L)
    val empty = Seq.empty[(Long, Seq[String])].toDF("doc_id", "s")
    assert(AllPairsJoin.jaccardSelfJoin(empty, "doc_id", "s", 7, 10).count() === 0)
  }

  test("triangles: self-loops are ignored") {
    val g = Seq((1L, 1L), (1L, 2L), (2L, 3L), (1L, 3L))
    val got = graft.operators.Triangles.perNode(g.toDF("id_a", "id_b"))
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("n_triangles")).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ---- RunningTotal ----

  test("running total: equals the single-partition window across partitionings") {
    val df = (1 to 500).map(i => ((i * 37) % 101, i.toLong, (i % 13).toLong))
      .toDF("k", "id", "v")
    val expect = df
      .withColumn("cum", sum($"v").over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"k", $"id")
          .rowsBetween(Long.MinValue, 0)))
      .orderBy($"k", $"id").collect().map(_.getAs[Long]("cum")).toSeq
    for (parts <- Seq(1, 5, 32)) {
      val got = RunningTotal.withRunningSum(df, Seq($"k", $"id"), $"v",
          "cum", numPartitions = parts)
        .orderBy($"k", $"id").collect().map(_.getAs[Long]("cum")).toSeq
      assert(got === expect, s"mismatch at numPartitions=$parts")
    }
  }

  test("running total: descending order keys (the budget query's shape)") {
    val df = (1 to 100).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val got = RunningTotal.withRunningSum(df, Seq($"id".desc), $"v", "cum",
        numPartitions = 4)
      .orderBy($"id".desc).collect()
    assert(got.head.getAs[Long]("cum") === got.head.getAs[Long]("v"))
    assert(got.last.getAs[Long]("cum") === (1 to 100).map(_ % 7).sum.toLong)
  }

  test("running total: accepts tinyint/smallint value columns, still rejects fractional") {
    // ADVICE r13: the guard compared simpleString against "byte"/"short",
    // but Spark renders those types as "tinyint"/"smallint" — valid
    // narrow integral columns were falsely rejected
    val expect = (1 to 20).map(i => (1 to i).map(_ % 3).sum.toLong)
    val byteDf = (1 to 20).map(i => (i.toLong, (i % 3).toByte)).toDF("id", "v")
    val gotB = RunningTotal.withRunningSum(byteDf, Seq($"id"), $"v", "cum",
        numPartitions = 3)
      .orderBy($"id").collect().map(_.getAs[Long]("cum")).toSeq
    assert(gotB === expect)
    val shortDf = (1 to 20).map(i => (i.toLong, (i % 3).toShort)).toDF("id", "v")
    val gotS = RunningTotal.withRunningSum(shortDf, Seq($"id"), $"v", "cum",
        numPartitions = 3)
      .orderBy($"id").collect().map(_.getAs[Long]("cum")).toSeq
    assert(gotS === expect)
    val e = intercept[IllegalArgumentException] {
      RunningTotal.withRunningSum(Seq((1L, 1.5)).toDF("id", "v"),
        Seq($"id"), $"v", "cum")
    }
    assert(e.getMessage.contains("quantize"))
  }

  test("pin registry: evict unpersists a session's pins") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "s").persist()
    df.count()
    graft.operators.PinRegistry.replace("spec.pinEvict", Seq(df))
    assert(df.storageLevel !== org.apache.spark.storage.StorageLevel.NONE)
    graft.operators.PinRegistry.evict(spark)
    assert(df.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "evict must unpersist registered pins (ADVICE r13: session-lifetime leak)")
  }

  test("pin registry: a third identical invocation keeps the SHARED cache entry (r15)") {
    import spark.implicits._
    // plan-identical handles share ONE CacheManager entry; the old
    // two-generation unpersist killed it on the third call (uncacheQuery
    // matches by plan) — the returned lazy plan then re-executed its
    // shuffle unpinned
    def make() = Seq((1, "a"), (2, "b")).toDF("id", "s")
    val h1 = make().persist(); h1.count()
    graft.operators.PinRegistry.replace("spec.pinShared", Seq(h1))
    val h2 = make().persist(); h2.count()
    graft.operators.PinRegistry.replace("spec.pinShared", Seq(h2))
    val h3 = make().persist(); h3.count()
    graft.operators.PinRegistry.replace("spec.pinShared", Seq(h3))
    assert(spark.sharedState.cacheManager
        .lookupCachedData(h3.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
        .isDefined,
      "third identical replace must not uncache the shared plan entry")
    graft.operators.PinRegistry.evict(spark)
    assert(spark.sharedState.cacheManager
      .lookupCachedData(h3.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
      .isEmpty)
  }

  test("pin registry: wide plans that render identically under " +
      "maxToStringFields still get distinct keys (r15 review)") {
    // canonicalized.toString truncates at spark.sql.debug.maxToStringFields;
    // force aggressive truncation so two plans differing only in a LATE
    // column render identically — the semanticHash key component must
    // still separate them, or the second replace() would orphan the
    // first handle un-freed (pinned for the session lifetime)
    val cols30a = (0 until 30).map(i => lit(i).as(s"c$i"))
    val cols30b = (0 until 30).map(i =>
      (if (i == 28) lit(-999) else lit(i)).as(s"c$i"))
    spark.conf.set("spark.sql.debug.maxToStringFields", "5")
    try {
      val a = spark.range(2).select(cols30a: _*).persist(); a.count()
      val b = spark.range(2).select(cols30b: _*).persist(); b.count()
      assert(a.queryExecution.analyzed.canonicalized.toString ===
        b.queryExecution.analyzed.canonicalized.toString,
        "fixture: the truncated renderings must collide for this test to bite")
      graft.operators.PinRegistry.replace("spec.pinWide", Seq(a))
      graft.operators.PinRegistry.replace("spec.pinWide", Seq(b))
      graft.operators.PinRegistry.evict(spark)
      assert(a.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
        "evict must release the FIRST wide plan's pin — a truncated-" +
          "toString key collision would have dropped its handle un-freed")
      assert(b.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
        "evict must release the second wide plan's pin")
    } finally spark.conf.unset("spark.sql.debug.maxToStringFields")
  }

  test("running total: rejects inputs that carry its helper columns") {
    val df = Seq((1L, 2L)).toDF("_rt_pid", "v")
    val e = intercept[IllegalArgumentException] {
      RunningTotal.withRunningSum(df, Seq($"v"), $"v", "cum")
    }
    assert(e.getMessage.contains("_rt_pid"))
  }

  // ---- query invariants over the fixture corpus ----

  test("priority sample: k rows, monotone priorities, weight-biased") {
    val rows = SamplingQueries.samplePriorityWeighted(spark, sf).collect()
    assert(rows.length === 100)
    val ps = rows.map(_.getAs[Long]("priority"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === 100)
    // weight bias: the sample's mean weight exceeds the corpus mean
    val corpusMean = graft.sources.Tables.documents(spark, sf)
      .agg(avg($"n_chars")).head.getDouble(0)
    val sampleMean = rows.map(_.getAs[Long]("weight")).sum.toDouble / 100
    assert(sampleMean > corpusMean)
  }

  test("source cap: ≤50 per source, heap order == window order, ⊆ global draw law") {
    val rows = SamplingQueries.sampleSourceCap(spark, sf).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.values.forall(_.length <= 50))
    for ((_, rs) <- bySource) {
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      val prios = sorted.map(_.getAs[Long]("priority"))
      assert(prios.zip(prios.tail).forall { case (a, b) => a >= b })
      assert(sorted.map(_.getAs[Int]("rk")).toSeq === (1 to rs.length))
    }
    // the capped draw uses the same priorities as the global sample:
    // any sampled doc of a source within the cap must appear here
    val global = SamplingQueries.samplePriorityWeighted(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val capped = rows.map(_.getAs[Long]("doc_id")).toSet
    val docSource = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perSourceGlobal = global.groupBy(docSource)
    assert(perSourceGlobal.forall { case (_, ids) =>
      ids.size > 50 || ids.subsetOf(capped) })
  }

  test("rendezvous: partition of the corpus; adding a shard only moves docs into it") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val total = docs.count()
    val byShard = SamplingQueries.shardRendezvous(spark, sf).collect()
    assert(byShard.map(_.getAs[Long]("n_docs")).sum === total)
    // recompute assignments in plain JVM md5 for 8 and 9 shards
    def u16(s: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      h.take(4).foldLeft(0)((a, c) => a * 16 + Character.digit(c, 16))
    }
    def assign(id: Long, n: Int): Int =
      (0 until n).maxBy(s => (u16(s"$id|shard|$s"), -s))
    val ids = docs.select($"doc_id").collect().map(_.getLong(0))
    val moved = ids.filter(id => assign(id, 8) != assign(id, 9))
    assert(moved.forall(id => assign(id, 9) === 8),
      "a doc moved between surviving shards")
    assert(moved.nonEmpty && moved.length < ids.length / 4,
      s"~1/9 of docs should move, got ${moved.length}/${ids.length}")
    // and the Spark-side assignment matches the JVM recompute
    val sparkCounts = byShard
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("n_docs")).toMap
    val jvmCounts = ids.groupBy(assign(_, 8)).map { case (s, a) => s -> a.length.toLong }
    assert(sparkCounts === jvmCounts)
  }

  test("mix diagnostics: entropy within [0, ln vocab], cosine within [-1, 1]") {
    val ent = graft.queries.MixQueries.sourceTokenEntropy(spark, sf).collect()
    assert(ent.nonEmpty)
    for (r <- ent) {
      val h = r.getAs[Long]("entropy_micro")
      val vocab = r.getAs[Long]("vocab")
      // Shannon bounds (with per-term rounding slack ≤ vocab/2 units)
      assert(h >= 0L)
      assert(h <= math.ceil(math.log(vocab.toDouble) * 1e6).toLong + vocab)
      assert(r.getAs[Long]("vocab") <= r.getAs[Long]("n_tokens"))
    }
    val sims = graft.queries.MixQueries.sourceCentroidSim(spark, sf).collect()
    val labels = sims.flatMap(r => Seq(r.getAs[Int]("label_a"),
      r.getAs[Int]("label_b"))).distinct.length
    assert(sims.length === labels * (labels - 1) / 2)
    assert(sims.forall { r =>
      val c = r.getAs[Double]("cos"); c >= -1.0 && c <= 1.0 })
  }

  test("budget select: kept set is the exact quality-ordered prefix under the cap") {
    val rows = SamplingQueries.budgetSelectTokens(spark, sf).collect()
    val kept = rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
      r.getAs[Long]("q_micro"))).toSeq
    val all = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id",
        graft.functions.TextFunctions.tokenCount($"text").cast("long"),
        round(graft.functions.TextFunctions.qualityScore($"text") * 1000000.0)
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val budget = all.map(_._2).sum / 2
    val expectIds = all.sortBy { case (id, _, q) => (-q, id) }
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (id, n, q)) =>
        (id, n, q, cum + n)
      }.tail.takeWhile(_._4 <= budget).map(_._1).toSet
    assert(kept.map(_._1).toSet === expectIds)
    assert(kept.map(_._2).sum <= budget)
  }
}
