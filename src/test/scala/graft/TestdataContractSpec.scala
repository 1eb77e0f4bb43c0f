package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.sources.Tables

/** The testdata-encoding CONTRACT, pinned as tests.
  *
  * Round 7 was lost to a silent environment change: the driver regenerated
  * `events.parquet` with `ts` as parquet TIMESTAMP(MICROS) where earlier
  * generations stored TIMESTAMP(NANOS), and the loader's hard-coded
  * nanos assumption broke 26 batch queries at analysis time — and, worse,
  * silently squashed streamed timestamps 1000× (micros read as nanos →
  * January 2024 collapsed into minutes of 1970). These tests make any
  * future encoding change fail loudly in `sbt test`, naming
  * [[Tables.events]], instead of surfacing as oracle mismatches.
  */
class TestdataContractSpec extends SparkSpec {

  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("events.ts loads as session-TZ TimestampType in every sf dir") {
    for (dir <- sfDirs) {
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt === TimestampType,
        s"$dir/events.parquet: Tables.events must normalize ts to " +
          s"TimestampType, got $dt — extend Tables.normalizeEventTs")
    }
  }

  test("events.ts instants are plausible (unit-squash canary)") {
    // A unit misread (ns↔us↔ms) shifts instants by 1000× — e.g. 2024
    // micros read as nanos collapse into ~43 minutes of January 1970.
    // Bound min/max to a generous real-world window so ANY squash or
    // inflation fails here with the loader named, not downstream in a
    // wrong-but-green oracle diff.
    for (dir <- sfDirs) {
      val row = Tables.events(spark, dir)
        .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
        .head()
      val (lo, hi) = (row.getInt(0), row.getInt(1))
      assert(lo >= 2000 && hi <= 2099,
        s"$dir/events.parquet: event years [$lo, $hi] outside [2000, 2099] — " +
          "Tables.normalizeEventTs is misreading the timestamp unit")
    }
  }

  test("every table loads with readable temporal columns in every sf dir") {
    // the r7 break came through events.ts, but orders.o_orderdate and
    // lineitem.l_shipdate are the same kind of generator-owned temporal
    // column — assert every table loads, has rows, and every
    // date/timestamp-named column reads as a temporal (or legacy long)
    // type, so the NEXT encoding change names its table here
    import org.apache.spark.sql.types._
    val temporalish = Set("ts", "o_orderdate", "l_shipdate")
    for (dir <- sfDirs; name <- Tables.names) {
      val df = Tables.load(spark, dir, name)
      assert(df.limit(1).count() === 1, s"$dir/$name.parquet is empty/unreadable")
      for (f <- df.schema.fields if temporalish(f.name)) {
        val ok = f.dataType match {
          case TimestampType | TimestampNTZType | DateType | LongType => true
          case _ => false
        }
        assert(ok, s"$dir/$name.parquet: temporal column ${f.name} reads as " +
          s"${f.dataType} — extend the loaders like Tables.normalizeEventTs")
      }
    }
  }

  test("full schema contract: every table's column names, order, and dtypes " +
      "(incl. array element types) in every sf dir") {
    // The r7 lesson generalized past temporal columns (VERDICT r8 ask
    // #4): pin the COMPLETE loaded schema of every table — names, their
    // order (a reorder once threatened positional unions), and exact
    // dtypes, down to the embeddings array's FLOAT element type. The
    // three generator-owned temporal columns stay dtype-adaptive (the
    // loaders normalize between the generations seen so far — session
    // TIMESTAMP, TIMESTAMP_NTZ, legacy nanos-as-BIGINT) but must still
    // be one of exactly those; everything else must match verbatim, so
    // the next regeneration of ANY table fails HERE with the table and
    // column named, not in a downstream oracle diff.
    val temporalish = Set("ts", "o_orderdate", "l_shipdate")
    val temporalOk = Set("TIMESTAMP", "TIMESTAMP_NTZ", "DATE", "BIGINT")
    val expect: Map[String, Seq[(String, String)]] = Map(
      "region" -> Seq("r_regionkey" -> "INT", "r_name" -> "STRING"),
      "nation" -> Seq("n_nationkey" -> "INT", "n_name" -> "STRING",
        "n_regionkey" -> "INT"),
      "customer" -> Seq("c_custkey" -> "BIGINT", "c_name" -> "STRING",
        "c_nationkey" -> "INT", "c_acctbal" -> "DOUBLE",
        "c_mktsegment" -> "STRING"),
      "supplier" -> Seq("s_suppkey" -> "BIGINT", "s_name" -> "STRING",
        "s_nationkey" -> "INT", "s_acctbal" -> "DOUBLE"),
      "part" -> Seq("p_partkey" -> "BIGINT", "p_name" -> "STRING",
        "p_brand" -> "STRING", "p_type" -> "STRING", "p_size" -> "INT",
        "p_retailprice" -> "DOUBLE"),
      "orders" -> Seq("o_orderkey" -> "BIGINT", "o_custkey" -> "BIGINT",
        "o_orderstatus" -> "STRING", "o_totalprice" -> "DOUBLE",
        "o_orderdate" -> "TIMESTAMP_NTZ", "o_orderpriority" -> "STRING"),
      "lineitem" -> Seq("l_orderkey" -> "BIGINT", "l_partkey" -> "BIGINT",
        "l_suppkey" -> "BIGINT", "l_linenumber" -> "INT",
        "l_quantity" -> "DOUBLE", "l_extendedprice" -> "DOUBLE",
        "l_discount" -> "DOUBLE", "l_tax" -> "DOUBLE",
        "l_returnflag" -> "STRING", "l_linestatus" -> "STRING",
        "l_shipdate" -> "TIMESTAMP_NTZ"),
      "events" -> Seq("event_id" -> "BIGINT", "ts" -> "TIMESTAMP_NTZ",
        "user_id" -> "BIGINT", "event_type" -> "STRING",
        "value" -> "DOUBLE", "props" -> "STRING"),
      "documents" -> Seq("doc_id" -> "BIGINT", "text" -> "STRING",
        "lang" -> "STRING", "source" -> "STRING", "n_chars" -> "BIGINT"),
      "embeddings" -> Seq("vec_id" -> "BIGINT",
        "embedding" -> "ARRAY<FLOAT>", "label" -> "INT"))
    assert(expect.keySet === Tables.names.toSet,
      "contract tables out of sync with Tables.names — extend the map")
    for (dir <- sfDirs; (name, cols) <- expect.toSeq.sortBy(_._1)) {
      val got = Tables.load(spark, dir, name).schema.fields
        .map(f => f.name -> f.dataType.sql).toSeq
      assert(got.map(_._1) === cols.map(_._1),
        s"$dir/$name.parquet: column names/order drifted — got " +
          s"${got.map(_._1).mkString(",")}, contract " +
          s"${cols.map(_._1).mkString(",")}")
      for (((cn, want), (_, gdt)) <- cols.zip(got)) {
        if (temporalish(cn))
          assert(temporalOk.contains(gdt),
            s"$dir/$name.parquet: temporal $cn reads as $gdt, outside the " +
              s"adaptive set $temporalOk — extend the loaders AND this contract")
        else
          assert(gdt === want,
            s"$dir/$name.parquet: $cn reads as $gdt, contract pins $want — " +
              "the generator changed this column's encoding; fix the " +
              "loaders/queries, then update the contract")
      }
    }
  }

  test("normalizeEventTs handles all three historical encodings identically") {
    import spark.implicits._
    // one instant, three physical arrivals: legacy nanos-as-long,
    // TIMESTAMP_NTZ (current testdata), session-TZ TIMESTAMP
    val instant = java.time.Instant.parse("2024-03-15T12:34:56.789012Z")
    val us = instant.getEpochSecond * 1000000L + instant.getNano / 1000L
    val asLong = Seq((1L, us * 1000L)).toDF("event_id", "ts")
    val asNtz = Seq((1L, java.time.LocalDateTime.ofInstant(
      instant, java.time.ZoneOffset.UTC))).toDF("event_id", "ts")
    val asLtz = Seq((1L, java.sql.Timestamp.from(instant))).toDF("event_id", "ts")
    val outs = Seq(asLong, asNtz, asLtz).map(Tables.normalizeEventTs)
    outs.foreach(df => assert(df.schema("ts").dataType === TimestampType))
    val vals = outs.map(_.select(unix_micros(col("ts"))).head().getLong(0))
    assert(vals.distinct === Seq(us),
      s"encodings disagree on the instant: $vals (expected $us)")
    // and an unknown arrival dtype fails loudly, naming the fix site
    val bad = intercept[IllegalStateException] {
      Tables.normalizeEventTs(Seq((1L, "2024-03-15")).toDF("event_id", "ts"))
    }
    assert(bad.getMessage.contains("normalizeEventTs"))
  }

  test("streamed events loader equals the batch loader row-for-row") {
    // Tables.eventsStream must produce exactly Tables.events' rows (same
    // normalization path, probed schema). A divergence means a streamed
    // query can silently compute on different instants than its batch
    // twin — the round-7 failure mode.
    val dir = sf
    val name = "events_stream_eq_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Tables.eventsStream(spark, dir)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table(name)
    val batch = Tables.events(spark, dir)
    assert(streamed.schema.map(f => (f.name, f.dataType)) ===
      batch.schema.map(f => (f.name, f.dataType)))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed events rows diverge from Tables.events")
  }
}
