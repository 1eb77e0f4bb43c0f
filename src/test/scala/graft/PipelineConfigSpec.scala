package graft

import graft.ops.PipelineConfig

class PipelineConfigSpec extends SparkSpec {
  import spark.implicits._

  private val users = Seq(
    ("id_0", "User0", "Doe0", "u0@x.com", 20, "secret"),
    ("id_1", "", "Doe1", "u1@x.com", 30, "secret"),
    ("id_2", "User2", "Doe2", "u2@x.com", 15, "secret")
  ).toDF("user_id", "first_name", "last_name", "email", "age", "raw_password_hash")

  test("config-built pipeline reproduces the SMT wiring (s3-sink.json:22-23)") {
    val pipeline = PipelineConfig.fromConfig(Map(
      "transforms" -> "clean",
      "transforms.clean.type" -> "profile",
      "transforms.clean.filter.cols" -> "first_name,last_name",
      "transforms.clean.drop.cols" -> "raw_password_hash",
      "transforms.clean.mask.col" -> "email",
      "transforms.clean.fullname.cols" -> "first_name,last_name",
      "transforms.clean.adult.col" -> "age",
      "transforms.clean.clock" -> "2024-01-01T00:00:00Z"))
    val out = pipeline(users).orderBy("user_id").collect()
    assert(out.length === 2) // id_1 filtered
    assert(!out.head.schema.fieldNames.contains("raw_password_hash"))
    assert(out.forall(_.getAs[String]("email") == "redacted@email.com"))
    assert(out.map(_.getAs[Boolean]("is_adult")).toSeq === Seq(true, false))
  }

  test("generic stage chain: filter -> mask -> derive") {
    val pipeline = PipelineConfig.fromConfig(Map(
      "transforms" -> "adults,hide,tag",
      "transforms.adults.type" -> "filter",
      "transforms.adults.predicate" -> "age >= 18",
      "transforms.hide.type" -> "mask",
      "transforms.hide.col" -> "email",
      "transforms.tag.type" -> "derive",
      "transforms.tag.col" -> "tier",
      "transforms.tag.expr" -> "CASE WHEN age >= 25 THEN 'senior' ELSE 'junior' END"))
    val out = pipeline(users).orderBy("user_id").collect()
    assert(out.map(_.getAs[String]("user_id")).toSeq === Seq("id_0", "id_1"))
    assert(out.map(_.getAs[String]("tier")).toSeq === Seq("junior", "senior"))
    assert(out.forall(_.getAs[String]("email") == "redacted"))
  }

  test("empty transforms list is identity; maskless profile keeps email") {
    val id = graft.ops.PipelineConfig.fromConfig(Map("transforms" -> ""))
    assert(id(users).collect().toSeq === users.collect().toSeq)
    val noMask = graft.ops.PipelineConfig.fromConfig(Map(
      "transforms" -> "p", "transforms.p.type" -> "profile",
      "transforms.p.filter.cols" -> "first_name"))
    val out = noMask(users).orderBy("user_id").collect()
    assert(out.length === 2)
    assert(out.head.getAs[String]("email") === "u0@x.com") // no mask configured
  }

  test("config-driven corpus pipeline matches the code-composed flagship's kept set") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val configured = PipelineConfig.fromConfig(Map(
      "transforms" -> "q,l,de,dm",
      "transforms.q.type" -> "quality_filter",
      "transforms.q.threshold" -> "0.5",
      "transforms.l.type" -> "lang_filter",
      "transforms.l.lang" -> "en",
      "transforms.de.type" -> "dedup_exact",
      "transforms.dm.type" -> "dedup_minhash",
      "transforms.dm.threshold" -> "0.8"))
    val keptViaConfig = configured(docs).select("doc_id").as[Long].collect().toSet
    val keptViaCode = graft.queries.DedupQueries.corpusPipelineFull(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(keptViaConfig === keptViaCode)
  }

  test("config-driven chunk stage emits (id, chunk_idx, chunk) rows") {
    val one = Seq((1L, Seq.fill(60)("tok").mkString(" "))).toDF("doc_id", "text")
    val chunked = PipelineConfig.fromConfig(Map(
      "transforms" -> "c",
      "transforms.c.type" -> "chunk",
      "transforms.c.size" -> "50",
      "transforms.c.stride" -> "40"))(one)
    val rows = chunked.collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 1))
    assert(rows.head.getString(2).split(" ").length === 50)
    assert(rows.last.getString(2).split(" ").length === 20)
  }

  test("unknown transform type fails fast") {
    assertThrows[IllegalArgumentException] {
      PipelineConfig.fromConfig(Map(
        "transforms" -> "x", "transforms.x.type" -> "nope"))
    }
  }
}
