package graft

import org.apache.spark.sql.functions._

import graft.queries.RetrievalQueries

/** BM25 and RRF laws the hash gate can't express: tf saturation,
  * rare-term dominance, fusion arithmetic, and arm bookkeeping. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("BM25: higher tf wins within a term; rare terms dominate common ones") {
    val docs = Seq(
      (0L, "apple rare"), // the query
      (1L, "apple banana cherry"),
      (2L, "apple apple banana"),
      (3L, "banana cherry banana"),
      (4L, "rare banana cherry")
    ).toDF("doc_id", "text")
    val out = RetrievalQueries.bm25TopK(docs, col("doc_id") === 0, k = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank"))).toMap
    // doc 4 holds the rare term (df=1) -> must beat every apple-only doc
    assert(out(4L) < out(1L) && out(4L) < out(2L),
      s"rare-term doc must outrank common-term docs: $out")
    // tf saturation is still monotone: apple x2 beats apple x1
    assert(out(2L) < out(1L), s"tf=2 must outrank tf=1 for the same term: $out")
    // doc 3 shares no query term -> absent from results
    assert(!out.contains(3L), s"no shared term may not score: $out")
  }

  test("BM25 registered query: contiguous ranks, positive integer scores, no self hits") {
    val rows = RetrievalQueries.bm25(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks === (1 to ranks.size), s"query $q ranks not contiguous")
      rs.foreach { r =>
        assert(r.getAs[Long]("score_q") > 0L)
        assert(r.getAs[Long]("doc_id") % 37 != 0L,
          "benchmark (query-side) docs are not in the searched corpus")
      }
    }
  }

  test("RRF: fused score is exactly the sum of the arms' reciprocal contributions") {
    val out = RetrievalQueries.hybridRrf(spark, sf).collect()
    assert(out.nonEmpty)
    def c(rank: Int): Long = math.round(1e9 / (rank + 60))
    // reconstruct both arms independently and recompute every fused row
    val docs = graft.sources.Tables.documents(spark, sf)
    val lex = RetrievalQueries.bm25TopK(docs, col("doc_id") % 50 === 0, k = 20)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Int]("rank")).toMap
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("id"))
    val vec = emb.filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("nvec"))
      .crossJoin(broadcast(emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))))
      .withColumn("sim",
        round(graft.functions.VectorFunctions.cosine(col("qvec"), col("nvec")), 9))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 20)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("id")) ->
        r.getAs[Int]("rank")).toMap
    out.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("id"))
      val expected = lex.get(key).map(c).getOrElse(0L) + vec.get(key).map(c).getOrElse(0L)
      assert(r.getAs[Long]("rrf") === expected, s"fusion arithmetic broke at $key")
      val arms = Seq(lex.contains(key), vec.contains(key)).count(identity)
      assert(r.getAs[Int]("n_arms") === arms, s"arm bookkeeping broke at $key")
    }
    // both arms must actually contribute somewhere in the fused top-10
    assert(out.exists(_.getAs[Int]("n_arms") == 2) ||
      (out.exists(r => lex.contains((r.getAs[Long]("query_id"), r.getAs[Long]("id")))) &&
       out.exists(r => vec.contains((r.getAs[Long]("query_id"), r.getAs[Long]("id"))))),
      "fusion must draw on both arms")
  }

  test("mined training pairs: negatives are lexically close but semantically far") {
    val rows = RetrievalQueries.trainingPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val posIds = rs.map(_.getAs[Long]("pos_id")).toSet
      assert(posIds.size === 1, s"anchor $q must have exactly one positive")
      val negIds = rs.map(_.getAs[Long]("neg_id"))
      assert(negIds.distinct.length === negIds.length, s"anchor $q repeated a negative")
      assert(!negIds.contains(posIds.head),
        s"anchor $q: the positive leaked into the negatives")
      assert(rs.map(_.getAs[Int]("neg_rank")).sorted.toSeq === (1 to rs.length),
        s"anchor $q: negative ranks not contiguous")
      rs.foreach(r => assert(r.getAs[Double]("neg_sim") < 0.35,
        s"anchor $q: negative above the semantic-dup band"))
    }
  }
}
