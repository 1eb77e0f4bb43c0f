package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingPipeline

/** Real-Kafka readiness receipt (VERDICT r8 ask #6).
  *
  * The sandbox has no spark-sql-kafka connector jar and no resolvable
  * Kafka broker, so `format("kafka")` is the ONE S2 surface the suite
  * cannot exercise end to end in-image ([[graft.sources.KafkaReplay]]
  * proves the full DSv2 contract against an on-disk Kafka-shaped log
  * instead — COVERAGE.md S2). This spec makes that gap one jar-drop
  * from tested, in tiers:
  *
  *  1. No `spark-sql-kafka-0-10` on the classpath → every test here
  *     auto-cancels with instructions (the in-sandbox state).
  *  2. Connector present, no broker → the connector's SCHEMA handshake
  *     runs: `kafkaStream`'s source must resolve to exactly the
  *     [[StreamingPipeline.kafkaShapedColumns]] contract without
  *     contacting any broker.
  *  3. Connector present AND `GRAFT_KAFKA_BOOTSTRAP=host:port` (an
  *     embedded or external broker) → a full produce→stream→assert
  *     roundtrip of `kafkaStream` + `enforceSchema`, the wiring the
  *     reference pipeline runs (producer/producer.py:64-66 →
  *     connector → sink).
  *
  * Everything Kafka-side goes through reflection so this file compiles
  * with zero Kafka dependencies — the whole point is that it ships
  * dormant and wakes up on a real cluster classpath.
  */
class KafkaIntegrationSpec extends SparkSpec {

  private def classPresent(fqcn: String): Boolean =
    try { Class.forName(fqcn); true } catch { case _: Throwable => false }

  private val connectorPresent =
    classPresent("org.apache.spark.sql.kafka010.KafkaSourceProvider")
  private val clientsPresent =
    classPresent("org.apache.kafka.clients.producer.KafkaProducer")
  private val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP").filter(_.nonEmpty)

  private val skipMsg =
    "spark-sql-kafka-0-10 not on the classpath — drop the connector jar " +
      "(plus kafka-clients) into the Spark jars dir to activate this spec; " +
      "in-sandbox the DSv2 contract is proven by KafkaReplaySpec instead"

  test("kafka source schema handshake yields the kafka-shaped column contract") {
    assume(connectorPresent, skipMsg)
    // Schema resolution is static in the connector — no broker contact.
    val df = StreamingPipeline.kafkaStream(spark, "graft-unreachable:9092", "users")
    assert(df.columns.toSeq === StreamingPipeline.kafkaShapedColumns,
      "kafkaStream's projected contract drifted from kafkaShapedColumns")
    assert(df.isStreaming, "format(\"kafka\") must resolve as a streaming source")
  }

  test("produce -> kafkaStream -> enforceSchema roundtrip against a live broker") {
    assume(connectorPresent, skipMsg)
    assume(clientsPresent, "kafka-clients not on the classpath")
    assume(bootstrap.isDefined,
      "set GRAFT_KAFKA_BOOTSTRAP=host:port (embedded or external broker) " +
        "to run the live roundtrip")
    val servers = bootstrap.get
    val topic = "graft_it_" + java.util.UUID.randomUUID().toString.take(8)

    // -- produce 3 JSON user records with string key/value (reflection:
    //    kafka-clients is not a compile-time dependency)
    val props = new java.util.Properties()
    props.put("bootstrap.servers", servers)
    val strSer = "org.apache.kafka.common.serialization.StringSerializer"
    props.put("key.serializer", strSer)
    props.put("value.serializer", strSer)
    val pCls = Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    val rCls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
    val producer = pCls.getConstructor(classOf[java.util.Properties])
      .newInstance(props)
    try {
      val ctor = rCls.getConstructor(
        classOf[String], classOf[Object], classOf[Object])
      val send = pCls.getMethod("send", rCls)
      (1 to 3).foreach { i =>
        val v = s"""{"user_id":$i,"first_name":"u$i","age":${20 + i}}"""
        send.invoke(producer, ctor.newInstance(topic, s"k$i", v)
          .asInstanceOf[Object])
      }
      pCls.getMethod("flush").invoke(producer)
    } finally pCls.getMethod("close").invoke(producer)

    // -- stream it back through the REAL wiring under AvailableNow
    val enforced = StreamingPipeline.enforceSchema(
      StreamingPipeline.kafkaStream(spark, servers, topic),
      org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, first_name STRING, age INT"))
    val sink = "kafka_it_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = enforced.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table(sink)
      .select(col("key"), col("v.user_id"), col("v.first_name"), col("v.age"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .toSet
    assert(rows === Set(("k1", 1L, "u1", 21), ("k2", 2L, "u2", 22),
      ("k3", 3L, "u3", 23)), "roundtrip rows diverged")
  }
}
