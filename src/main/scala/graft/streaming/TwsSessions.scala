package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap sessionization on Spark 4's `transformWithState` — the third
  * keyed-state streaming API surface beside
  * [[StreamingPipeline.dedupWithinWatermark]]
  * (`dropDuplicatesWithinWatermark`) and [[StreamingPipeline.gapSessions]]
  * (`flatMapGroupsWithState`), carrying the SAME session semantics so the
  * two custom-state implementations are mutually provable: same compressed
  * gap-disjoint interval state, same watermark late-drop, same
  * emit-exactly-when-closable contract, same DuckDB oracle.
  *
  * What the new API changes operationally (and why an engine should offer
  * it): state lives in named, individually-evolvable typed slots on the
  * RocksDB state store rather than one opaque blob (here a single
  * `ValueState[SessState]`), timers are first-class (register/delete per
  * key, many at once) instead of the one implicit timeout slot, and
  * processors compose initial state and TTL declaratively. At 100 TB the
  * scale story is unchanged from `gapSessions` — state per key is bounded
  * by the in-horizon SESSION count (compressed intervals, never raw
  * events), keys hash-partition across executors, and RocksDB spills
  * state off-heap, which is precisely the regime where the blob-per-key
  * HDFS store of fMGWS starts to hurt.
  *
  * Timer discipline: exactly one live timer per key, re-armed to the
  * earliest closable session (`min(last + gap)`), clamped past the
  * current watermark. `handleExpiredTimer` re-partitions the interval
  * list against the advanced watermark and emits every newly-closable
  * session, so idle keys drain without new input — the AvailableNow
  * no-data batch after the sentinel pushes the watermark is what flushes
  * the final sessions under the oracle gate.
  */
object TwsSessions {

  class GapSessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, SessEvent, SessionOut] {

    @transient private var sessions: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sessions = getHandle.getValueState[SessState](
        "sessions", Encoders.product[SessState], TTLConfig.NONE)

    /** Interval merge shared with the fMGWS twin: sort by start, coalesce
      * while the next interval starts within `gap` of the previous end. */
    private def merge(prior: List[SessAcc], fresh: List[SessAcc]): List[SessAcc] =
      (prior ++ fresh).sortBy(s => (s.start_us, s.last_us))
        .foldLeft(List.empty[SessAcc]) {
          case (prev :: tail, cur) if cur.start_us - prev.last_us < gapUs =>
            SessAcc(prev.start_us,
              math.max(prev.last_us, cur.last_us), prev.n + cur.n) :: tail
          case (acc, cur) => cur :: acc
        }.reverse

    /** Emit closable sessions against the current watermark, persist the
      * rest, and re-arm the single per-key timer. */
    private def drain(key: Long, fresh: List[SessAcc],
        timers: TimerValues): Iterator[SessionOut] = {
      val wmMs = timers.getCurrentWatermarkInMs()
      val wmUs = wmMs * 1000L
      val prior = if (sessions.exists()) sessions.get().sessions else Nil
      val (closed, open) = merge(prior, fresh).partition(_.last_us + gapUs <= wmUs)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (open.isEmpty) sessions.clear()
      else {
        sessions.update(SessState(open))
        val nextUs = open.map(_.last_us + gapUs).min
        getHandle.registerTimer(math.max(wmMs + 1L, (nextUs + 999L) / 1000L))
      }
      closed.iterator.map(s => SessionOut(key, s.start_us, s.last_us, s.n))
    }

    override def handleInputRows(key: Long, rows: Iterator[SessEvent],
        timers: TimerValues): Iterator[SessionOut] = {
      // late rows (at or before the watermark) are dropped by the engine
      // before reaching the processor in event-time mode; the guard here
      // keeps the semantics explicit and processor-local
      val wmUs = timers.getCurrentWatermarkInMs() * 1000L
      val fresh = rows.filter(_.ts_us >= wmUs)
        .map(e => SessAcc(e.ts_us, e.ts_us, 1L)).toList
      drain(key, fresh, timers)
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] =
      drain(key, Nil, timers)
  }

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The RocksDB provider `transformWithState` requires, applied around a
    * stream start and restored after: returns the prior setting. */
  def withRocksDb[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  /** Declare the sessionization over an event stream. The input must
    * already carry its watermark (same contract as `gapSessions`). */
  def gapSessionsTws(events: Dataset[SessEvent], gapUs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new GapSessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
