package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Internal validation for every rows-only (approximate / engine-hash)
  * query: each sketch or LSH path is checked against its exact
  * counterpart, so "no DuckDB oracle" never means "unverified".
  */
class ApproxValidationSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct lands within its rsd bound of the exact count") {
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("d"))
      .as[(String, Long)].collect().toMap
    val approx = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(approx_count_distinct($"l_partkey", 0.02).as("a"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, d) =>
      val rel = math.abs(approx(k) - d).toDouble / d
      assert(rel <= 0.1, s"flag $k: approx ${approx(k)} vs exact $d (rel $rel)")
    }
  }

  test("approx_percentile brackets the exact percentile") {
    val rows = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(
        expr("approx_percentile(value, 0.5D, 1000)").as("p50a"),
        expr("percentile(value, 0.5D)").as("p50e"))
      .as[(String, Double, Double)].collect()
    rows.foreach { case (t, a, e) =>
      assert(math.abs(a - e) <= math.max(0.05 * math.abs(e), 1e-6),
        s"$t: approx p50 $a vs exact $e")
    }
  }

  test("freqItems candidates include every true heavy hitter above support") {
    val n = Tables.events(spark, sf).count()
    val trueHeavy = Tables.events(spark, sf)
      .groupBy($"user_id").count()
      .filter($"count" > n * 0.05)
      .select($"user_id").as[Long].collect().toSet
    val candidates = Tables.events(spark, sf)
      .stat.freqItems(Array("user_id"), 0.05)
      .select(explode($"user_id_freqItems").as("u"))
      .as[Long].collect().toSet
    // the sketch guarantee: no false negatives (false positives allowed)
    assert(trueHeavy.subsetOf(candidates),
      s"missed heavy hitters: ${trueHeavy -- candidates}")
  }

  test("count-min sketch estimates bound exact counts (never under, eps*N over)") {
    // the sketch-MERGE shape (per-partition sketches unioned by the agg)
    // with CMS's published guarantee: estimate >= exact always, and
    // <= exact + eps*N with the configured confidence. Fixed seed +
    // fixed corpus makes the outcome deterministic, so exact bounds are
    // assertable (a fresh seed could legitimately exceed eps*N for
    // ~(1-confidence) of keys).
    val ev = Tables.events(spark, sf)
    val eps = 0.001
    val n = ev.count()
    val bytes = ev.agg(expr("count_min_sketch(user_id, 0.001D, 0.999D, 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    assert(cms.totalCount() === n)
    val exact = ev.groupBy($"user_id").count().as[(Long, Long)].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (uid, c) =>
      val est = cms.estimateCount(uid)
      assert(est >= c, s"CMS undercounted key $uid: $est < $c")
      assert(est <= c + math.ceil(eps * n).toLong,
        s"CMS overcount beyond eps*N for key $uid: $est vs exact $c (N=$n)")
    }
  }

  test("LSH kNN self-join recovers a reasonable share of exact kNN edges") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.knnJoinLsh(emb, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // 8×4-bit banding measures ~0.70 on this (driver-fixed) corpus at
    // half the candidate volume of 8×3 (0.87); 0.6 still catches a
    // mis-tuned banding (4×4 = 0.44)
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.6, s"kNN-join recall vs exact too low: $recall")
    // scores on recovered edges are exact (LSH only prunes candidates)
    assert(lsh.nonEmpty)
  }

  test("stub decode features are deterministic across runs") {
    def run(): Array[(Long, String)] =
      graft.queries.MultimodalQueries.decodeFeatures(spark, sf)
        .select($"media_id", concat_ws("|", $"payload_md5", $"emb_l2").as("sig"))
        .as[(Long, String)].collect()
    assert(run().toSeq === run().toSeq)
  }
}
