package graft.tools

import graft.queries.RetrievalQueries
import graft.sources.GraftSession

/** One half of the two-process durable-index receipt
  * (PostingIndexCrossJvmSpec forks this main twice): open a
  * DURABLE-catalog session ([[GraftSession.localDurable]]) against a
  * shared (warehouse, Derby metastore) pair, report whether the
  * bucketed posting index already exists in the catalog, run the
  * registered persisted-index probe (`bm25Indexed` — which builds the
  * table only on a catalog miss), and report the probe-join plan's
  * exchange count above the bucketed index scan. The spec asserts run
  * 2 sees `existed=true`, probes the exact bytes run 1 wrote (file
  * listing unchanged), and plans no Exchange over the index side —
  * the "write once EVER" half of the bucketed-index claim that an
  * in-memory catalog cannot exhibit.
  *
  * Usage: `PostingIndexCli <sfDir> <warehouseDir> <metastoreDir>`.
  * Prints one parseable line: `[xjvm] existed=<bool> rows=<n>
  * indexExchanges=<n>` (indexExchanges counts hash exchanges in the
  * broadcast-disabled probe join MINUS the one legitimate query-side
  * exchange — 0 means the index scan fed the join shuffle-free).
  */
object PostingIndexCli {
  def main(args: Array[String]): Unit = {
    args.toList match {
      case sfDir :: warehouse :: metastore :: Nil =>
        val spark = GraftSession.localDurable(4, warehouse, metastore)
        try {
          val table = RetrievalQueries.postingIndexTableName(sfDir)
          val existed = spark.catalog.tableExists(table)
          val rows = RetrievalQueries.bm25Indexed(spark, sfDir).count()
          // the probe join alone with broadcast disabled: the bucketed
          // index side must reach the join without an Exchange; the
          // exploded query-terms side legitimately shuffles once (the
          // RetrievalSpec plan assertion, replayed cross-JVM). Query
          // side and split predicate come from the registered query's
          // own builders, so this receipt tracks the real probe shape.
          val queries = RetrievalQueries.bm25IndexedQueries(spark, sfDir)
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          val probe = queries.join(
            spark.table(table).filter(RetrievalQueries.bm25IndexedCorpusPred), Seq("t"))
          val exchanges = "Exchange hashpartitioning".r
            .findAllIn(probe.queryExecution.executedPlan.toString).size
          println(s"[xjvm] existed=$existed rows=$rows indexExchanges=${exchanges - 1}")
        } finally spark.stop()
      case _ =>
        System.err.println("usage: PostingIndexCli <sfDir> <warehouseDir> <metastoreDir>")
        sys.exit(2)
    }
  }
}
