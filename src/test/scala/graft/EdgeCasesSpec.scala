package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{AsOfJoin, Dedup, Similarity}

/** Degenerate-input behavior: every operator must return an empty (or
  * well-defined) result on empty frames rather than throwing — the
  * partitions-with-no-data case every real cluster job hits.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("dedup operators on an empty corpus return empty, not errors") {
    assert(Dedup.exact(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.minhashNearDups(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.simhashNearDups(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.winnowingCandidates(emptyDocs, "doc_id", "text", 3, 4, 1).count() === 0)
    assert(Dedup.ngramJaccardFingerprintBlocked(emptyDocs, "doc_id", "text", 3, 0.8)
      .count() === 0)
  }

  test("similarity operators on empty corpus / empty query sets return empty") {
    val oneVec = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(emptyVecs, oneVec, "vec_id", "embedding", 5).count() === 0)
    assert(Similarity.bruteForceTopK(oneVec, emptyVecs, "vec_id", "embedding", 5).count() === 0)
    assert(Similarity.lshTopK(oneVec, emptyVecs, "vec_id", "embedding", 5).count() === 0)
    assert(Similarity.knnJoinLsh(emptyVecs, "vec_id", "embedding", 5).count() === 0)
    assert(Similarity.nearDupPairs(emptyVecs, "vec_id", "embedding", 0.5).count() === 0)
    assert(Similarity.nearDupPairsLsh(emptyVecs, "vec_id", "embedding", 0.5).count() === 0)
  }

  test("as-of join with an empty right side keeps all left rows unmatched") {
    val left = Seq((1L, 10L, 1L), (2L, 20L, 1L)).toDF("event_id", "tsv", "user_id")
      .select(col("event_id"), timestamp_micros(col("tsv")).as("ts"), col("user_id"))
    val right = Seq.empty[(Long, Long, Long)].toDF("event_id", "tsv", "user_id")
      .select(col("event_id"), timestamp_micros(col("tsv")).as("ts"), col("user_id"))
    val out = AsOfJoin.joinAsOf(left, right, "user_id", "user_id", "ts", "ts", "event_id")
    assert(out.count() === 2)
    assert(out.filter(col("r_event_id").isNotNull).count() === 0)
  }

  test("text expressions handle empty and whitespace-only strings") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("id", "text")
    val got = df.select($"id",
      TextFunctions.shingles($"text", 3).as("sh"),
      TextFunctions.winnowingFingerprints($"text", 3, 4).as("wf"),
      TextFunctions.minShingleFingerprint($"text", 3).as("mf"),
      TextFunctions.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1), r.getSeq[String](2), r.isNullAt(3))).toMap
    // sub-k-token docs: empty shingle/fingerprint sets, null min-shingle
    got.foreach { case (_, (sh, wf, mfNull)) =>
      assert(sh.isEmpty && wf.isEmpty && mfNull)
    }
  }

  test("cosine on empty arrays yields 0 (zero-norm contract)") {
    val df = Seq((Array.empty[Float], Array.empty[Float])).toDF("a", "b")
    val v = df.select(VectorFunctions.cosine($"a", $"b")).head().getDouble(0)
    assert(v === 0.0)
  }
}
