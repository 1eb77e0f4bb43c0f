package graft

/** Scratch dev main: BPE learn step-cost curve (VERDICT r3 item 3) —
  * wall time vs steps at the default checkpoint cadence (expect linear)
  * and with checkpointing disabled (the old lineage-stacking behavior,
  * expect superlinear). Results recorded in BENCH_NOTES.md. */
object BpeTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.sources.GraftSession.local(32)
    val docs = graft.sources.Tables.documents(spark, dir)
    docs.count() // warm

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[bpetime] $name: $s%.2f s")
      s
    }

    val mode = args.drop(1).headOption.getOrElse("all")
    if (mode != "off")
      for (steps <- Seq(10, 25, 50))
        time(s"learn steps=$steps cadence=8 batch=8") {
          graft.operators.Bpe.learn(docs, "text", steps)
        }
    if (mode == "seq")
      for (steps <- Seq(10, 25, 50))
        time(s"learn steps=$steps cadence=8 batch=1 (sequential)") {
          graft.operators.Bpe.learn(docs, "text", steps, batchSize = 1)
        }
    if (mode == "off")
      for (steps <- Seq(10, 25))
        time(s"learn steps=$steps cadence=off") {
          graft.operators.Bpe.learn(docs, "text", steps,
            checkpointCadence = Int.MaxValue)
        }
    spark.stop()
  }
}
