package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Input row for the recent-history processor. */
case class RecentIn(user_id: Long, event_id: Long, ts: Timestamp)

/** One buffered event in the per-user recent-history state. */
case class RecentEvent(ts: Timestamp, event_id: Long)

/** One emitted recent-history row: slot 1 = the newest event. */
case class RecentOut(user_id: Long, slot: Int, event_id: Long, ts: Timestamp)

/** Per-user bounded recent-event buffer on `transformWithState` +
  * `ListState` — the third keyed-state shape (ValueState sessions,
  * MapState counts, and now a list): the online-feature "last k events
  * per user" that a serving layer reads for context windows or
  * recency features. ListState is the right container because the
  * engine stores each element as its own RocksDB entry: the per-batch
  * rewrite is the k merged survivors, never a monolithic per-key blob,
  * and k is a small constant — bounded write amplification per key per
  * batch no matter how long the stream runs.
  *
  * Eviction is by event time, not arrival: the buffer keeps the k
  * newest by (ts, event_id), so late rows slot in correctly as long as
  * they clear the watermark. Emission matches [[TwsCounts]]: data
  * batches only re-arm a watermark+1 timer; the key's first no-input
  * batch flushes a full slot-numbered snapshot. The j-th newest of a
  * growing event set is monotone non-decreasing in (ts, event_id), so
  * downstream settles per (user, slot) by max(struct(ts, event_id)) —
  * the max IS the latest snapshot's occupant of that slot.
  */
object TwsRecent {

  class RecentEventsProcessor(k: Int)
      extends StatefulProcessor[Long, RecentIn, RecentOut] {

    @transient private var buf: ListState[RecentEvent] = _

    private val newestFirst: Ordering[RecentEvent] =
      Ordering.by((r: RecentEvent) =>
        (r.ts.getTime, r.ts.getNanos.toLong, r.event_id)).reverse

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[RecentEvent]("recent",
        Encoders.product[RecentEvent], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[RecentIn],
        timers: TimerValues): Iterator[RecentOut] = {
      val merged = (buf.get().toSeq ++
        rows.map(e => RecentEvent(e.ts, e.event_id)))
        .sorted(newestFirst).take(k)
      buf.put(merged.toArray)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(timers.getCurrentWatermarkInMs() + 1L)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[RecentOut] =
      buf.get().toSeq.sorted(newestFirst).zipWithIndex.iterator
        .map { case (r, i) => RecentOut(key, i + 1, r.event_id, r.ts) }
  }

  /** Declare the recent-k buffer over a watermarked event-id stream. */
  def recentEvents(events: Dataset[RecentIn], k: Int): Dataset[RecentOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RecentEventsProcessor(k),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
