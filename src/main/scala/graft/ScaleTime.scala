package graft

import org.apache.spark.sql.functions._

/** Scratch dev main: the 100× scaling probe (VERDICT r3 items 4+7).
  *
  * A) Synthetic deterministic embedding corpora at n = 2k / 20k / 200k
  *    (no sf1 testdata exists): candidate-pair mass for the registered
  *    static 6×3 banding vs the self-tuned `autoBitsPerBand` banding,
  *    plus wall time of the full near-dup clusters pipeline under the
  *    auto banding — the quadratic-vs-linear receipt.
  * B) `corpus_pipeline_full` wall time across the three real scale
  *    factors (100× spread) — the text-path scaling exponent.
  *
  * Results recorded in BENCH_NOTES.md. */
object ScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.GraftSession.local(32)
    import graft.operators.Similarity

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[scaletime] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    // deterministic 64-dim vectors in [-1,1): md5-derived, seed-free
    def synth(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), d ->
        |  cast(cast(conv(substr(md5(concat(id, '|', d)), 1, 8), 16, 10) AS BIGINT)
        |       % 2000000 AS DOUBLE) / 1e6 - 1.0)""".stripMargin)
        .cast("array<float>").as("embedding"))

    // registered-query envelope: real embeddings, md5 planes, 6×3
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val n = emb.count()
      val c = Similarity.candidatePairCount(
        emb, "vec_id", "embedding", bands = 6, bitsPerBand = 3, md5Planes = true)
      println(s"[scaletime] REAL $dir n=$n md5_6x3_candidates=$c")
    }

    Seq(2000L, 20000L, 200000L).foreach { n =>
      val emb = synth(n).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      emb.count()
      val static63 = Similarity.candidatePairCount(
        emb, "vec_id", "embedding", bands = 6, bitsPerBand = 3)
      val autoBits = Similarity.autoBitsPerBand(n)
      val auto = Similarity.candidatePairCount(
        emb, "vec_id", "embedding", bands = 6, bitsPerBand = autoBits)
      println(f"[scaletime] n=$n static6x3=$static63 (${static63.toDouble / n}%.1f/vec) " +
        f"auto6x$autoBits=$auto (${auto.toDouble / n}%.1f/vec)")
      time(s"neardup_clusters n=$n auto6x$autoBits") {
        graft.operators.Dedup.connectedComponents(
          Similarity.nearDupPairsLsh(emb, "vec_id", "embedding",
            threshold = 0.9, bitsPerBand = autoBits)
            .select(col("id_a"), col("id_b")))
          .write.format("noop").mode("overwrite").save()
      }
      emb.unpersist()
    }

    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { dir =>
        time(s"corpus_pipeline_full $dir") {
          graft.queries.DedupQueries.corpusPipelineFull(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
      }

    // C) SemDeDup scaling: static nCells=16 intra-cell pair mass vs the
    //    autoNCells sizing — the semantic-dedup quadratic-vs-linear
    //    receipt (mirrors probe A for the LSH banding). Cells come from
    //    the cheap seeded quantizer (same assignment machinery; Lloyd
    //    iterations don't change the mass profile, only cell quality).
    Seq(2000L, 20000L, 200000L).foreach { n =>
      val emb = synth(n).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      emb.count()
      def pairMass(cells: Int): Long =
        graft.operators.Ivf.buildSeededFlat(emb, "vec_id", "embedding", cells)._2
          .groupBy(col("cell")).agg(count(lit(1)).as("n"))
          .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)))
          .first().getLong(0)
      val static16 = pairMass(16)
      val autoK = Similarity.autoNCells(n)
      val auto = pairMass(autoK)
      println(f"[scaletime] semdedup n=$n static16=$static16 " +
        f"(${static16.toDouble / n}%.1f/vec) autoK=$autoK auto=$auto " +
        f"(${auto.toDouble / n}%.1f/vec)")
      emb.unpersist()
    }

    // E) PQ scaling: codebook train (1 Lloyd round) + full encode wall
    //    time and mean distortion across 100× synthetic growth — the
    //    encode-is-one-scan receipt, plus evidence the sampled+refined
    //    codebook's quality doesn't degrade as the corpus grows.
    Seq(2000L, 20000L, 200000L).foreach { n =>
      val emb = synth(n).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      emb.count()
      val codes = time(s"pq_train_encode n=$n") {
        val cb = graft.operators.Pq.codebook(emb, "vec_id", "embedding",
          dim = 64, m = 8, k = 16, iters = 1)
        val c = graft.operators.Pq.encode(emb, cb, "vec_id", "embedding",
          dim = 64, m = 8)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count()
        c
      }
      val meanErr = codes.agg(avg(col("qerr"))).first().getDouble(0)
      println(f"[scaletime] pq n=$n mean_qerr=$meanErr%.3e")
      codes.unpersist(); emb.unpersist()
    }

    // F) BM25 index profile across the real 100× spread: postings grow
    //    with the corpus, but the term dictionary (the broadcast df
    //    side) and max df stay vocabulary-bounded — the receipt that
    //    the posting probe's broadcast sides don't grow with data.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { dir =>
        val docs = graft.sources.Tables.documents(spark, dir)
        val occ = docs.filter(col("doc_id") % 37 =!= 0)
          .select(col("doc_id"), explode(
            graft.functions.TextFunctions.tokens(col("text"))).as("t"))
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
        val postings = occ.count()
        val vocab = occ.select(col("t")).distinct().count()
        println(s"[scaletime] bm25 $dir postings=$postings term_dict=$vocab")
      }

    // D) Perplexity-LM boundedness: distinct char-trigram vocabulary vs
    //    corpus size across the real 100× spread — the receipt that the
    //    LM broadcast in text_perplexity_buckets stays charset³-bounded
    //    while the corpus grows.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { dir =>
        val docs = graft.sources.Tables.documents(spark, dir)
        val tri = docs.select(explode(
          when(length(col("text")) >= 3,
            expr("transform(sequence(1, length(text)-2), i -> substring(text, i, 3))"))
            .otherwise(array().cast("array<string>"))).as("tri"))
        val occ = tri.count()
        val vocab = tri.distinct().count()
        println(s"[scaletime] perplexity_lm $dir occurrences=$occ trigram_vocab=$vocab")
      }
    spark.stop()
  }
}
