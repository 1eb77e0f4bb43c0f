package graft

import org.apache.spark.sql.functions._

/** Scratch dev main: the retrieval-stack 100× scaling receipt
  * (round 6). A FIXED query batch (doc_id < 100 — the realistic
  * workload shape: query volume does not grow with the corpus) probes
  * the shared posting index across the three real scale factors
  * (100× corpus spread), with index BUILD time and PROBE time
  * measured separately. The claim under test: probes reuse the built
  * index, and probe cost grows with the matched posting mass (~linear
  * in corpus), never with a rebuild. Results in BENCH_NOTES.md.
  *
  * Usage: `runMain graft.RetrievalTime <sfDir> [<sfDir> ...]` (or set
  * SPARK_GRAFT_SF_DIRS to a comma-separated list) — the corpus dirs
  * are arguments like Bench's, never baked-in machine paths. */
object RetrievalTime {
  def main(args: Array[String]): Unit = {
    val dirs: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else sys.env.get("SPARK_GRAFT_SF_DIRS").map(_.split(",").toSeq).getOrElse {
        System.err.println(
          "usage: RetrievalTime <sfDir> [<sfDir> ...]  (or SPARK_GRAFT_SF_DIRS=d1,d2)")
        sys.exit(2)
      }
    val spark = graft.sources.GraftSession.local(32)
    import graft.queries.RetrievalQueries
    import graft.functions.TextFunctions.tokens

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    dirs.foreach { dir =>
        val docs = graft.sources.Tables.documents(spark, dir)
        val n = docs.count()
        val build = time {
          RetrievalQueries.postingsIndex(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        val queries = docs.filter(col("doc_id") < 100)
          .select(col("doc_id").as("query_id"),
            explode(array_distinct(tokens(col("text")))).as("t"))
        val probes = (1 to 2).map { _ =>
          time {
            RetrievalQueries.bm25ProbeDenorm(queries,
                RetrievalQueries.postingsIndex(spark, dir)
                  .filter(col("doc_id") >= 100), k = 10)
              .write.format("noop").mode("overwrite").save()
          }
        }
        println(f"[retrievaltime] $dir docs=$n build=$build%.2f s " +
          f"probe1=${probes.head}%.2f s probe2=${probes.last}%.2f s (100 queries)")
      }
    spark.stop()
  }
}
