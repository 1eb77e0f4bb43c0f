package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{RecentIn, RecentOut, TwsRecent, TwsSessions}

/** List-state recent-k buffer (`TwsRecent`): event-time eviction, a late
  * row slotting into its correct position, superseding snapshots, and
  * the per-(user, slot) max(struct(ts, event_id)) settle. */
class TwsRecentSpec extends SparkSpec {
  import spark.implicits._

  private implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("TWS list-state recent-k: eviction, late slotting, settle") {
    val baseMin = 1440L
    def ev(uid: Long, id: Long, min: Long): RecentIn =
      RecentIn(uid, id, new Timestamp((baseMin + min) * 60L * 1000L))
    val stream = MemoryStream[RecentIn]
    val recent = TwsRecent.recentEvents(
      stream.toDS().withWatermark("ts", "600 minutes"), k = 3)
    TwsSessions.withRocksDb(spark) {
      val q = recent.writeStream.format("memory").queryName("tws_recent_spec")
        .outputMode("append").start()
      try {
        // settle exactly like the registered query: latest snapshot per
        // (user, slot) via max(struct(ts, event_id))
        def settled(): Map[(Long, Int), Long] =
          spark.table("tws_recent_spec").as[RecentOut].collect()
            .groupBy(r => (r.user_id, r.slot))
            .view.mapValues(_.maxBy(r => (r.ts.getTime, r.event_id)).event_id)
            .toMap
        // batch 1: four events → k=3 evicts the oldest (id 1); the
        // no-data batch flushes snapshot slots (4, 3, 2) newest-first
        stream.addData(ev(1, 1, 0), ev(1, 2, 10), ev(1, 3, 20), ev(1, 4, 30))
        q.processAllAvailable()
        assert(settled() === Map((1L, 1) -> 4L, (1L, 2) -> 3L, (1L, 3) -> 2L),
          s"first snapshot wrong: ${settled()}")
        // batch 2: a LATE row (min 25 < the buffered min 30, above the
        // watermark) must slot between ids 4 and 3 — event-time order,
        // not arrival order. A late row does NOT advance the watermark,
        // so the re-armed timer can't fire yet; a pusher row for
        // another user advances it and flushes u1's superseding
        // snapshot (4, 99, 3). The settle keeps every slot's latest
        // occupant.
        stream.addData(ev(1, 99, 25))
        q.processAllAvailable()
        stream.addData(ev(50, 1000, 2000))
        q.processAllAvailable()
        assert(settled() === Map((1L, 1) -> 4L, (1L, 2) -> 99L, (1L, 3) -> 3L,
          (50L, 1) -> 1000L), s"late-row snapshot wrong: ${settled()}")
      } finally q.stop()
    }
  }
}
