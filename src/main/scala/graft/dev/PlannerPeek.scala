package graft.dev

/** Dev-only: print the measured planner tables and the prescriptive
  * choices at a given scale — the numbers behind the autoBand /
  * autoProbe policy constants. */
object PlannerPeek {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.sources.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    println(s"== ivf probe plan @ $dir ==")
    graft.queries.SimilarityQueries.simIvfProbePlan(spark, dir)
      .collect().foreach(println)
    println(s"== autoprobe choice ==")
    graft.queries.SimilarityQueries.simIvfAutoprobe(spark, dir)
      .collect().foreach(println)
    println(s"== bucket plan @ $dir ==")
    graft.queries.SimilarityQueries.simLshBucketPlan(spark, dir)
      .collect().foreach(println)
    println(s"== autoband choice ==")
    graft.queries.SimilarityQueries.simAutobandChoice(spark, dir)
      .collect().foreach(println)
    spark.stop()
  }
}
