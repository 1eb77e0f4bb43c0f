package graft

import java.time.Instant

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.ProfileTransform

/** Golden-fixture parity with the reference SMT
  * (`/root/reference/smt/.../UserProfileTransform.java`, fixture
  * `/root/reference/producer/producer.py:49-61`, FIXTURES.md §1):
  * 4 users, index 2 has a blank first_name and must be filtered; PII
  * columns dropped; email masked; full_name/is_adult/processed_ts derived.
  */
class ProfileTransformSpec extends SparkSpec {

  private val addressType = StructType(Seq(
    StructField("street", StringType), StructField("city", StringType),
    StructField("zip_code", StringType)))

  private val userSchema = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType, nullable = false),
    StructField("age", IntegerType),
    StructField("raw_password_hash", StringType),
    StructField("internal_tracking_code", StringType),
    StructField("address", addressType)))

  private def user(i: Int, first: String, last: String, age: java.lang.Integer): Row =
    Row(s"id_$i", first, last, s"user$i@example.com", age,
      "secret123", "TRACK_XYZ", Row(s"$i St", "City", "00000"))

  private val golden = Seq(
    user(0, "User0", "Doe0", 20),
    user(1, "User1", "Doe1", 21),
    user(2, "", "Doe2", 22), // blank first name → filtered (producer.py:50,54)
    user(3, "User3", "Doe3", 23))

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), userSchema)

  private val clock = Instant.parse("2024-01-01T00:00:00Z")
  private val t = ProfileTransform(clock = Some(clock))

  test("golden fixture: 3 of 4 records survive, masked, dropped, derived") {
    val out = t(df(golden)).orderBy("user_id").collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[String]("user_id")).toSeq === Seq("id_0", "id_1", "id_3"))
    val cols = t(df(golden)).columns.toSet
    assert(!cols.contains("raw_password_hash") && !cols.contains("internal_tracking_code"))
    assert(out.forall(_.getAs[String]("email") == "redacted@email.com"))
    assert(out.map(_.getAs[String]("full_name")).toSeq === Seq("User0 Doe0", "User1 Doe1", "User3 Doe3"))
    assert(out.forall(_.getAs[Boolean]("is_adult")))
    assert(out.forall(_.getAs[String]("processed_ts") == "2024-01-01T00:00:00Z"))
  }

  test("nested address struct passes through untouched (T5)") {
    val out = t(df(golden)).orderBy("user_id").collect()
    assert(out.head.getAs[Row]("address") === Row("0 St", "City", "00000"))
  }

  test("blank-after-trim and null names are filtered (T2, java:35)") {
    val edge = Seq(
      user(10, " ", "X", 30),      // blank after trim → dropped
      user(11, "A", null, 30),     // null last → dropped
      user(12, null, "B", 30),     // null first → dropped
      user(13, "\t", "C", 30),     // whitespace only → dropped
      user(14, " Ok ", "D", 30))   // survives (trim non-empty)
    val out = t(df(edge)).collect()
    assert(out.map(_.getAs[String]("user_id")).toSeq === Seq("id_14"))
  }

  test("null age yields is_adult=false, not null (T7, java:70-71)") {
    val edge = Seq(user(20, "A", "B", null), user(21, "C", "D", 17), user(22, "E", "F", 18))
    val out = t(df(edge)).orderBy("user_id").collect()
    assert(out.map(r => r.getAs[Boolean]("is_adult")).toSeq === Seq(false, false, true))
    assert(out.forall(!_.isNullAt(out.head.fieldIndex("is_adult"))))
  }

  test("wall-clock mode produces ISO-ish strings (T8)") {
    val out = ProfileTransform()(df(golden)).select("processed_ts").collect()
    assert(out.forall(_.getString(0).matches("\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}.*")))
  }
}
