package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Abandonment monitoring on Spark 4's `transformWithState` — the
  * arbitrary-state API successor to flatMapGroupsWithState, used here
  * for the one capability fMGWS cannot express cleanly: EVENT-TIME
  * TIMERS. A session that simply goes quiet never sends another event
  * to close itself; the timer fires when the watermark passes
  * `last event + gap`, so the open tail session emits WITHOUT waiting
  * for (or fabricating) a next arrival.
  *
  * Semantics: per user, gap-sessionize (a >gap silence closes the
  * session); a closed session with at least one click and no purchase
  * is ABANDONED and emits (user, session end, event count, click
  * count). Batch-run, the input is exhaustive so every session is
  * closed — the declarative path computes the identical set, which is
  * the oracle seam.
  *
  * Scale shape: O(1) state per user (last-ts + three counters — never
  * an event buffer), one timer per user, and the state store is meant
  * to run on RocksDB (`spark.sql.streaming.stateStore.providerClass`,
  * required by transformWithState) where state spills off-heap — the
  * 100 TB-of-users posture.
  */
object SessionMonitor {

  case class SessionEvent(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)
  case class Abandoned(user_id: Long, session_end: Timestamp, n_events: Long, n_clicks: Long)
  /** Public (not private): the state encoder's generated code must
    * reach the constructor and accessors — a private class silently
    * drops state (de)serialization to the interpreted path. */
  case class SessState(
      lastTsMs: Long, nEvents: Long, nClicks: Long, hasPurchase: Boolean)

  private class AbandonmentProcessor(gapMs: Long)
    extends StatefulProcessor[Long, SessionEvent, Abandoned] {

    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[SessState](
        "session", Encoders.product[SessState], TTLConfig.NONE)
    }

    private def closed(userId: Long, st: SessState): Iterator[Abandoned] =
      if (st.nClicks > 0 && !st.hasPurchase)
        Iterator.single(Abandoned(
          userId, new Timestamp(st.lastTsMs), st.nEvents, st.nClicks))
      else Iterator.empty

    override def handleInputRows(
        userId: Long,
        rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[Abandoned] = {
      val batch = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val out = Seq.newBuilder[Abandoned]
      var st = if (state.exists()) state.get() else null
      for (e <- batch) {
        val tsMs = e.ts.getTime
        if (st != null && tsMs - st.lastTsMs > gapMs) {
          out ++= closed(userId, st)
          st = null
        }
        st =
          if (st == null)
            SessState(tsMs, 1L,
              if (e.event_type == "click") 1L else 0L,
              e.event_type == "purchase")
          else
            SessState(math.max(st.lastTsMs, tsMs), st.nEvents + 1L,
              st.nClicks + (if (e.event_type == "click") 1L else 0L),
              st.hasPurchase || e.event_type == "purchase")
      }
      if (st != null) {
        state.update(st)
        // ONE live timer per user: re-arm at the new session horizon
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(st.lastTsMs + gapMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        userId: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Abandoned] =
      if (state.exists()) {
        val st = state.get()
        state.clear()
        closed(userId, st)
      } else Iterator.empty
  }

  case class ActivityCount(user_id: Long, n_total: Long)

  /** TTL-EVICTED per-user activity counter — the state-TTL dimension
    * of transformWithState, complementing the event-time timers above
    * (Spark permits TTL state only under `TimeMode.ProcessingTime`, so
    * it needs its own processor). The running count lives in a
    * ValueState with `TTLConfig(ttl)`: every update refreshes the
    * clock, and a user idle past the TTL has the state EVICTED by the
    * store — the count restarts from zero on their return. This is the
    * 100 TB-of-users state bound: without TTL (or an explicit timer
    * sweep), every user that ever appeared holds store space forever;
    * with it, state size tracks the ACTIVE key set. Processing-time
    * TTL is wall-clock-dependent, so this path is deliberately NOT in
    * the oracle surface — `SessionMonitorSpec`'s TTL battery pins the
    * semantics (survives restart inside TTL, evicted past it,
    * refreshed by updates). */
  private class ActivityProcessor(ttl: java.time.Duration)
    extends StatefulProcessor[Long, SessionEvent, ActivityCount] {

    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long](
        "n", Encoders.scalaLong, TTLConfig(ttl))
    }

    override def handleInputRows(
        userId: Long,
        rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[ActivityCount] = {
      val prev = if (count.exists()) count.get() else 0L
      val n = prev + rows.size
      count.update(n)
      Iterator.single(ActivityCount(userId, n))
    }
  }

  /** Per-user cumulative event counts with TTL-bounded state (see
    * [[ActivityProcessor]]); one output row per (user, micro-batch). */
  def activityCounts(events: DataFrame, ttl: java.time.Duration): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select("event_id", "ts", "user_id", "event_type")
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new ActivityProcessor(ttl),
        TimeMode.ProcessingTime(),
        OutputMode.Append(),
        Encoders.product[ActivityCount])
      .toDF()
  }

  /** Abandoned sessions of `events(event_id, ts, user_id, event_type)`.
    * Streaming input runs the timer-driven processor (append mode,
    * event-time); batch input computes the same set declaratively. */
  def abandonedSessions(
      events: DataFrame,
      gapMs: Long = 2L * 3600 * 1000,
      watermarkDelay: String = "2 hours"): DataFrame = {
    if (!events.isStreaming) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      import graft.functions.Transforms.microsOf
      return events
        .withColumn("__brk",
          when(microsOf(col("ts")) - microsOf(lag(col("ts"), 1).over(w))
            > gapMs * 1000L, 1).otherwise(0))
        .withColumn("__sid", sum("__brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "__sid")
        .agg(max("ts").as("session_end"),
          count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_clicks"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("__purch"))
        .filter(col("n_clicks") > 0 && col("__purch") === 0)
        .select("user_id", "session_end", "n_events", "n_clicks")
    }
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select("event_id", "ts", "user_id", "event_type")
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new AbandonmentProcessor(gapMs),
        TimeMode.EventTime(),
        OutputMode.Append(),
        Encoders.product[Abandoned])
      .toDF()
  }
}
