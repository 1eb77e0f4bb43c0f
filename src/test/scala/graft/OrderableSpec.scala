package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, CdcMerge, Orderable}
import graft.ops.Reconcile

/** ADVICE r14 (CdcMerge.scala:56): the deterministic-tiebreak structs
  * put every payload column into an ordering expression — a MapType
  * payload column (orderable nowhere in Spark) must be silently excluded
  * from the ORDERING, not fail analysis, while still riding in the
  * output. Pins the contract for all three r14 tiebreak sites.
  */
class OrderableSpec extends SparkSpec {
  import spark.implicits._

  private def withMap = Seq(
    ("a", 1L, "x", Map("m" -> 1)),
    ("a", 2L, "y", Map("m" -> 2)),
    ("b", 1L, "z", Map("m" -> 3)))
    .toDF("k", "seq", "v", "attrs")

  test("Orderable.columns drops map-typed (and map-containing) columns only") {
    val df = withMap
      .withColumn("arr_of_map", array(col("attrs")))
      .withColumn("s", struct(col("v"), col("attrs")))
    assert(Orderable.columns(df, df.columns.toSeq) === Seq("k", "seq", "v"))
  }

  test("CdcMerge.latestPerKey: MapType payload survives and does not fail analysis") {
    val latest = CdcMerge.latestPerKey(
      withMap.withColumn("op", lit("U")), "k", "seq", "op")
    val rows = latest.collect().map(r =>
      r.getString(0) -> r.getAs[Map[String, Int]]("__chg_attrs")).toMap
    assert(rows === Map("a" -> Map("m" -> 2), "b" -> Map("m" -> 3)))
  }

  test("Reconcile.lastWriterWins: MapType column rides through, ties still deterministic") {
    val out = Reconcile.lastWriterWins(withMap, "k", "seq")
    val byK = out.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(byK === Map("a" -> "y", "b" -> "z"))
    // tied order values with ONLY a map differing: any winner is fine
    // (maps are unorderable), but analysis must not fail
    val tied = Seq(("a", 1L, Map("m" -> 1)), ("a", 1L, Map("m" -> 2)))
      .toDF("k", "seq", "attrs")
    assert(Reconcile.lastWriterWins(tied, "k", "seq").count() === 1L)
  }

  test("AsOfJoin.joinAsOf: MapType right-payload column does not fail the dedup window") {
    val left = Seq(("a", 5L)).toDF("lk", "lts")
    val right = Seq(("a", 3L, 1L, Map("m" -> 1)), ("a", 3L, 2L, Map("m" -> 2)))
      .toDF("rk", "rts", "tb", "attrs")
    val out = AsOfJoin.joinAsOf(left, right, "lk", "rk", "lts", "rts", "tb")
    val r = out.collect()
    assert(r.length === 1)
    assert(r.head.getAs[Map[String, Int]]("r_attrs") === Map("m" -> 2),
      "greatest tiebreak must still win with a map column present")
  }
}
