package graft

import java.sql.Timestamp
import java.time.Instant

import graft.operators.AsOfJoin
import graft.plans.GraftExtensions

case class L(id: Long, k: String, ts: Timestamp)
case class R(rid: Long, k: String, ts: Timestamp, v: Double)

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(s))

  private val left = Seq(
    L(1, "a", t(10)), L(2, "a", t(20)), L(3, "a", t(5)),
    L(4, "b", t(100)), L(5, "c", t(50))).toDF()
  private val right = Seq(
    R(100, "a", t(8), 1.0), R(101, "a", t(15), 2.0), R(102, "a", t(20), 3.0),
    R(103, "b", t(100), 4.0), R(104, "b", t(100), 5.0) // tie on (k, ts)
  ).toDF()

  test("as-of join picks the latest right row at or before each left ts") {
    val out = AsOfJoin.joinAsOf(left, right, "k", "k", "ts", "ts", tiebreak = "rid")
      .select("id", "r_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === Some(100L)) // ts=10 -> right ts=8
    assert(out(2L) === Some(102L)) // exact-equal ts matches
    assert(out(3L) === None)       // nothing at or before ts=5
    assert(out(5L) === None)       // key with no right rows
  }

  test("right-side (key, ts) ties resolve to the greatest tiebreak") {
    val out = AsOfJoin.joinAsOf(left, right, "k", "k", "ts", "ts", tiebreak = "rid")
      .select("id", "r_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(4L) === Some(104L))
  }

  test("a null right timestamp is never an as-of match (r13 review)") {
    // nulls sort FIRST ascending: pre-r13 the null-ts row led its key's
    // partition and was carried forward as a phantom match for every
    // left row before the first real right row
    val rWithNull = right.unionByName(
      Seq((999L, "a", Option.empty[Timestamp], 9.0)).toDF("rid", "k", "ts", "v"))
    val out = AsOfJoin.joinAsOf(left, rWithNull, "k", "k", "ts", "ts", tiebreak = "rid")
      .select("id", "r_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(3L) === None, s"null-ts right row matched as-of: ${out(3L)}")
    assert(out(1L) === Some(100L) && out(2L) === Some(102L),
      "real matches must be unaffected by the null-ts row")
  }

  test("cosine_similarity is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val sim = spark.sql(
      "SELECT cosine_similarity(array(cast(1.0 as float), cast(0.0 as float)), " +
        "array(cast(1.0 as float), cast(0.0 as float))) AS s").head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("topk_by_score is callable from SQL as an aggregate") {
    GraftExtensions.register(spark)
    Seq((1L, 0.3, 10L), (1L, 0.9, 11L), (1L, 0.5, 12L))
      .toDF("g", "score", "id").createOrReplaceTempView("tk")
    val top = spark.sql(
      "SELECT topk_by_score(score, id, 2) AS top FROM tk GROUP BY g")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(_.getLong(1)) === Seq(11L, 12L))
  }

  test("SQL surface fails with usage messages, not raw JVM errors (r13 review)") {
    GraftExtensions.register(spark)
    Seq((1L, 0.3, 10L)).toDF("g", "score", "id").createOrReplaceTempView("tk2")
    // wrong arity: a usage message, not IndexOutOfBoundsException
    val e1 = intercept[Exception] {
      spark.sql("SELECT topk_by_score(score, id) FROM tk2 GROUP BY g").collect()
    }
    assert(e1.getMessage.contains("usage") || e1.getMessage.contains("argument"),
      s"unhelpful arity error: ${e1.getMessage.take(200)}")
    // NULL k: rejected with the literal-int message, not an NPE
    val e2 = intercept[Exception] {
      spark.sql("SELECT topk_by_score(score, id, NULL) FROM tk2 GROUP BY g").collect()
    }
    assert(e2.getMessage.contains("literal int"),
      s"unhelpful null-k error: ${e2.getMessage.take(200)}")
    // the Spark-conventional mode names work (the label suggested them;
    // pre-r13 'PERMISSIVE'.toBoolean threw)
    val ok = spark.sql(
      "SELECT from_avro_confluent(cast(null as binary), " +
        "'{\"type\":\"record\",\"name\":\"R\",\"fields\":[]}', 'PERMISSIVE') AS v")
      .head()
    assert(ok.isNullAt(0)) // null input decodes to null, no parse error
    val e3 = intercept[Exception] {
      spark.sql(
        "SELECT from_avro_confluent(cast(null as binary), " +
          "'{\"type\":\"record\",\"name\":\"R\",\"fields\":[]}', 'LENIENT')").collect()
    }
    assert(e3.getMessage.contains("PERMISSIVE/FAILFAST"),
      s"unhelpful mode error: ${e3.getMessage.take(200)}")
  }
}
