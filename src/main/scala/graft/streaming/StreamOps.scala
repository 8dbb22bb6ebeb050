package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming faces of the engine's event operators: the same
  * gap-sessionization the batch path runs (graft.ops.SessionQueries) as an
  * incremental stateful stream, plus watermarked windowed aggregation.
  *
  * The reference is batch-only (SURVEY.md §2.5 — no streaming constructs),
  * so this is engine capability beyond parity: `readStream` sources flow
  * through the exact same typed logic, and state is bounded per key (one
  * open session), which is what survives an unbounded 100 TB/day stream.
  */
object StreamOps {

  case class Event(user_id: Long, tms: Long, value: Double)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
                        n_events: Int, sum_value: Double)
  case class OpenSession(start: Long, last: Long, n: Int, total: Double)
  /** Internal grouped-input shape: Event plus the event-time column the
    * EventTimeTimeout checker requires to remain visible at the stateful
    * operator (a projection that drops it fails analysis). */
  case class EventW(user_id: Long, tms: Long, value: Double, ets: java.sql.Timestamp)

  /** Incremental gap sessionization: one bounded state record per user;
    * a session is emitted when a later event arrives more than `gapMs`
    * after the session's last event, or when the event-time watermark
    * passes the session's gap horizon (`last + gapMs`) — so an idle user's
    * final session is flushed and its state dropped instead of being
    * retained forever on an unbounded stream.
    *
    * `watermarkDelay` is the lateness tolerance: larger values accept
    * older stragglers but delay idle-session flushes by the same amount
    * (the inherent streaming tradeoff). Note the standard watermark
    * contract that comes with it: input events at or before the current
    * watermark are dropped by the engine before reaching the state
    * function. Works identically on a bounded MemoryStream and an
    * unbounded source; in batch execution timeouts never fire and the
    * trailing open session is simply not emitted. */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 watermarkDelay: String = "24 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming // plain val: the closure must not capture the Dataset
    // EventTimeTimeout needs an event-time watermark, and the watermarked
    // column must stay visible at the stateful operator — so the grouped
    // input carries it as a typed field (EventW)
    val evw = events.withColumn("ets", timestamp_millis(col("tms"))).as[EventW]
    val withWatermark =
      if (streaming) evw.withWatermark("ets", watermarkDelay) else evw
    withWatermark
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[EventW], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's gap horizon: no event
            // can extend it any more — flush and free the state
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.last, s.n, s.total))
          } else {
          val sorted = it.toSeq.sortBy(e => (e.tms, e.value))
          var open = state.getOption
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.tms < s.start - gapMs =>
                // straggler older than the open session's reach: it belongs
                // to an already-closed span, so it forms its own session —
                // merging would regress the start without bound and diverge
                // from the batch twin's semantics
                closed += SessionOut(user, e.tms, e.tms, 1, e.value)
              case Some(s) if e.tms - s.last <= gapMs =>
                // min/max: a late event from a subsequent micro-batch may
                // extend the session backwards (within one gap) but must
                // never regress the frontier (events are only sorted
                // within a batch, not across batches)
                open = Some(OpenSession(math.min(s.start, e.tms),
                  math.max(s.last, e.tms), s.n + 1, s.total + e.value))
              case Some(s) =>
                closed += SessionOut(user, s.start, s.last, s.n, s.total)
                open = Some(OpenSession(e.tms, e.tms, 1, e.value))
              case None =>
                open = Some(OpenSession(e.tms, e.tms, 1, e.value))
            }
          }
          open.foreach { s =>
            state.update(s)
            // flush when the watermark passes last+gap; never set a
            // timeout at or before the current watermark (illegal)
            if (streaming)
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs + 1))
          }
          closed.result().iterator
          }
      }
  }

  /** Watermarked tumbling-window event counts: the canonical
    * readStream → withWatermark → window → agg shape. `ts` must be a
    * TimestampType column. */
  def windowedCounts(events: DataFrame, watermark: String, windowLen: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
}

/** `transformWithState` processor (Spark 4's arbitrary-stateful-processing
  * API — the successor to flatMapGroupsWithState, built for the RocksDB
  * state store): per-user spend-MILESTONE accounting. Each user carries one
  * fixed-size state record (cumulative exact cents, upward milestone
  * crossings, event count); every input batch folds its rows in
  * deterministic (tms, event_id) order and emits the RUNNING totals.
  *
  * "Upward crossings" counts how many `stepCents` boundaries the running
  * balance crosses UPWARD — `max(0, floorDiv(new) − floorDiv(old))` per
  * event — which is path-dependent (a dip below a boundary and recovery
  * re-counts it), i.e. a statistic only ordered stateful processing can
  * produce, not any order-insensitive aggregate. floorDiv matches
  * DuckDB's flooring `//`, so the oracle replays it with a running-sum
  * window, integer-exact.
  *
  * Scale shape: state is 3 longs per user under RocksDB (Spark requires
  * the RocksDB provider for transformWithState — its changelog
  * checkpointing is what makes 100 GB-state streams commit in O(delta));
  * emission is one row per active user per batch. */
object MilestoneOps {
  case class TwsEvent(user_id: Long, tms: Long, event_id: Long, cents: Long)
  case class MilestoneState(cum: Long, cross: Long, n: Long)
  case class MilestoneOut(user_id: Long, n_events: Long, cum_cents: Long,
                          up_crossings: Long)

  class MilestoneProcessor(stepCents: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TwsEvent, MilestoneOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[MilestoneState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MilestoneState]("milestone",
        org.apache.spark.sql.Encoders.product[MilestoneState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
                                 timers: TimerValues): Iterator[MilestoneOut] = {
      var s = if (st.exists()) st.get() else MilestoneState(0L, 0L, 0L)
      // deterministic fold order inside the batch: the iterator arrives in
      // partition order, which is not a contract — sort by (tms, event_id)
      rows.toSeq.sortBy(e => (e.tms, e.event_id)).foreach { e =>
        val next = s.cum + e.cents
        val up = math.max(0L,
          Math.floorDiv(next, stepCents) - Math.floorDiv(s.cum, stepCents))
        s = MilestoneState(next, s.cross + up, s.n + 1)
      }
      st.update(s)
      Iterator.single(MilestoneOut(key, s.n, s.cum, s.cross))
    }
  }

  /** The milestone stream: group by user, run the processor. Callers set
    * the RocksDB provider (mandatory for transformWithState). */
  def milestones(events: Dataset[TwsEvent], stepCents: Long): Dataset[MilestoneOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new MilestoneProcessor(stepCents),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }
}
