package graft.dev

/** Dev-only: print every Tables loader's Spark schema for one sf dir. */
object SchemaDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.sources.GraftSession.local(4)
    for (n <- graft.sources.Tables.names) {
      val df = graft.sources.Tables.load(spark, dir, n)
      println(s"TABLE $n :: " +
        df.schema.fields.map(f => s"${f.name}=${f.dataType.sql}").mkString(", "))
    }
    println("EVENTS-NORMALIZED :: " +
      graft.sources.Tables.events(spark, dir).schema.fields
        .map(f => s"${f.name}=${f.dataType.sql}").mkString(", "))
    spark.stop()
  }
}
