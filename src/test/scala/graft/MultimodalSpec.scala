package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromDocuments(Tables.documents(spark, sf))

  test("media table has binary payloads with typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    assert(media.filter($"kind".isin("image", "audio", "video")).count() === media.count())
  }

  test("stubbed decode is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.payload_md5).toSeq === f2.map(_.payload_md5).toSeq)
    assert(f1.forall(_.embedding.length === 8))
    // feature md5 equals declarative md5 of payload (same bytes seen)
    val declarative = Multimodal.payloadStats(media)
      .select("media_id", "payload_md5").as[(Long, String)].collect().toMap
    assert(f1.forall(f => declarative(f.media_id) == f.payload_md5))
  }

  test("resize scales metadata down to max width, keeps payload") {
    val resized = Multimodal.resizeMeta(media, maxWidth = 128)
    assert(resized.filter($"meta.width" > 128).count() === 0)
    val before = media.select(md5($"payload")).as[String].collect().sorted
    val after = resized.select(md5($"payload")).as[String].collect().sorted
    assert(before.toSeq === after.toSeq)
  }

  test("frame sampling emits one task per 250ms step, video only") {
    val frames = Multimodal.frameSample(media, everyMs = 250)
    val perVideo = frames.groupBy("media_id").count()
    val expected = media.filter($"kind" === "video")
      .select($"media_id", ($"meta.duration_ms" / 250 + 1).cast("long").as("n"))
    val joined = perVideo.join(expected, "media_id")
      .filter($"count" =!= $"n").count()
    assert(joined === 0)
    assert(frames.select("media_id").distinct().count() ===
      media.filter($"kind" === "video").count())
  }
}
