package graft

/** Smoke + shape checks for every registered query at sf0.001, plus
  * flagship-specific semantic assertions. The DuckDB hash comparison runs
  * driver-side (Verify.scala); here we assert structure and invariants.
  */
class QueriesSpec extends SparkSpec {

  test("every registered query returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      lintComparedDtypes(name, df.schema)
      val n = df.count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  /** Registry-wide compared-output dtype lint (r15 verdict task 2).
    *
    * The driver's correctness gate and the local stand-in
    * (tools/check_oracle.py) fetch cells through different stacks
    * (pandas parquet read vs DuckDB fetchdf), and some dtype classes
    * canonicalize differently across them even when the VALUES agree:
    * DecimalType arrives as `decimal.Decimal` objects on one side and
    * float64 on the other (the r15 `avro_logical_types` red row), and
    * DateType as `datetime.date` vs Timestamp. Discipline: compared
    * outputs carry integers (micro-units / unix_micros) or strings;
    * the hazard types may appear freely INSIDE a plan, never in the
    * final projection of an oracle-backed query. Allowlist is empty
    * by policy — a new entry needs a driver-green round proving the
    * representation is safe. */
  private val dtypeAllowlist: Set[String] = Set.empty
  private def lintComparedDtypes(
      name: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types._
    if (!SparkEntry.oracleSql.contains(name) || dtypeAllowlist(name)) return
    // recurse into containers (r16 ADVICE #4): a hazard dtype NESTED in a
    // struct/array/map column fetches through the same divergent stacks
    // as a top-level one — the lint must see the whole tree
    def scan(dt: DataType, path: String): Unit = dt match {
      case d @ (_: DecimalType | DateType) =>
        val label = if (d == DateType) "DateType" else "DecimalType"
        fail(s"query $name emits compared column '$path' as $label — " +
          "a cross-checker canonicalization hazard; project it as " +
          "unix_micros/micro-unit BIGINT or a string instead " +
          "(see avro_logical_types, r15 verdict)")
      case s: StructType =>
        s.fields.foreach(f => scan(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => scan(a.elementType, s"$path[]")
      case m: MapType =>
        scan(m.keyType, s"$path<key>"); scan(m.valueType, s"$path<value>")
      case _ => ()
    }
    schema.fields.foreach(f => scan(f.dataType, f.name))
  }

  test("windowed sequence match discriminates (some users convert, some don't)") {
    // a funnel where every user matches (or none does) verifies nothing;
    // the 48h window must split the corpus both ways
    import org.apache.spark.sql.functions.col
    val df = graft.queries.TemporalQueries.eventsSequenceMatch(spark, sf)
    val m = df.filter(col("matched")).count()
    assert(m > 0 && m < df.count(), s"degenerate match split: $m of ${df.count()}")
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("weighted-mean Aggregator is partition-order independent (exact decimal buffer)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def run(parts: Int): Map[String, Double] =
      graft.sources.Tables.orders(spark, sf).repartition(parts)
        .select(col("o_orderpriority"),
          col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"),
          (col("o_orderkey") % 10 + 1).as("w"))
        .as[(String, java.math.BigDecimal, Long)]
        .groupByKey(_._1)
        .agg(graft.expressions.WeightedMean
          .of[(String, java.math.BigDecimal, Long)](_._2, _._3).toColumn.name("wavg"))
        .collect().toMap
    val one = run(1)
    val many = run(13)
    assert(one === many) // bit-identical, not approximately equal
  }

  test("flagship entry returns rows and all five audit statuses appear") {
    val df = SparkEntry.entry(spark)
    val statuses = df.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses.keySet === Set("OK", "FILTERED (expected)", "MISSING", "ORPHAN", "FAILED"),
      s"got: $statuses")
    assert(statuses.values.forall(_ > 0))
  }

  test("audit: no sink row retains the dropped secret except FAILED rows") {
    val df = graft.queries.RelationalQueries.sinkFromUsers(spark, sf)
    val leaky = df.filter(df("raw_secret").isNotNull)
      .filter(df("user_id") % 89 =!= 0).count()
    assert(leaky === 0)
  }
}
