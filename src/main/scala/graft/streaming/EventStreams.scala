package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators: watermarked windowed aggregation and
  * custom-state sessionization — the Structured Streaming surface beyond
  * the reference's micro-batch CDC loop.
  *
  * Both operators run UNCHANGED on batch DataFrames (Spark executes
  * `window`/`flatMapGroupsWithState` in batch mode with empty state),
  * which is the testability seam: correctness is oracle-checked in batch
  * via the driver gate, and the streaming specs drive the same code
  * through a file-source stream to assert the stateful semantics
  * (watermark finalization, cross-micro-batch state).
  */
object EventStreams {

  /** Tumbling event-time window × event_type counts with a watermark.
    *
    * Scale shape: partial aggregation map-side, one shuffle on
    * (window, event_type); streaming state is one row per open
    * (window, type) pair and the watermark bounds how many windows stay
    * open — state size is O(types × windows-in-delay), independent of
    * input rate. */
  def windowedTypeCounts(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("event_type"),
        col("n_events"))

  /** Top-`topK` event types per window by count — the trending-items
    * report. Batch-executed it is the oracle-checked composition below;
    * in a STREAM the rank stage must run in `foreachBatch` over the
    * windows the watermark has CLOSED (the append-mode output of the
    * windowed agg), because ranking an open window would reorder on
    * every update — [[rankWindows]] is that per-batch stage, and the
    * streaming spec drives it end-to-end. */
  def windowedTopTypes(
      events: DataFrame,
      topK: Int = 3,
      windowDur: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    rankWindows(windowedTypeCounts(events, windowDur, watermarkDelay), topK)

  /** Rank stage of [[windowedTopTypes]]: deterministic top-k within each
    * window (count desc, then type). One shuffle on w_start; rows are
    * (window × type) aggregates, never events. */
  def rankWindows(counts: DataFrame, topK: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("w_start").orderBy(desc("n_events"), col("event_type"))
    counts
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
  }

  /** SLIDING event-time windows (length > slide ⇒ each event lands in
    * length/slide windows): same watermarked agg family as the tumbling
    * form, state is one row per OPEN (window, type) pair — the overlap
    * factor multiplies state and output, not input passes (the window()
    * generator expands map-side before the single shuffle). */
  def slidingTypeCounts(
      events: DataFrame,
      windowDur: String = "2 hours",
      slideDur: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur, slideDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("event_type"),
        col("n_events"))

  /** Tumbling-window DISTINCT-user counts: per-window dedup state feeding
    * a windowed count — the streaming form of
    * `COUNT(DISTINCT user_id) GROUP BY window`, which no single
    * aggregation can express incrementally.
    *
    * Two chained stateful operators (Spark ≥ 3.5 watermark propagation):
    * dropDuplicates keyed on (window, user) holds one state row per
    * distinct pair and the downstream count holds one row per open
    * window; both evict when the watermark passes the window end, so
    * state is O(distinct users per in-flight window), never O(history).
    * In batch mode the same plan degenerates to distinct + count (the
    * oracle seam). */
  def windowedUniqueUsers(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .select(window(col("ts"), windowDur).as("w"), col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_users"))
      .select(
        col("w.start").as("w_start"),
        col("w.end").as("w_end"),
        col("n_users"))

  /** Streaming exact dedup with BOUNDED state: duplicate keys arriving
    * within the watermark horizon are dropped, and key state older than
    * the watermark is evicted — state is O(keys in horizon), not
    * O(history). The streaming face of Dedup.exactDedup; cross-run
    * history dedup composes with the fingerprint store
    * (Dedup.incrementalDedup) in the foreachBatch sink instead. */
  def dedupWithinWatermark(
      events: DataFrame,
      keys: Seq[String],
      watermarkDelay: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(keys)
    else
      // batch seam: Spark rejects dropDuplicatesWithinWatermark on
      // batch frames. A batch frame has no watermark, so the whole
      // input is one "horizon" and the operator degenerates to plain
      // per-key dedup. NOTE the deliberate semantic edge: duplicates
      // separated by MORE than `watermarkDelay` of event time re-emit
      // under streaming execution (key state was evicted) but collapse
      // here — the oracle replays duplicates within one horizon, and a
      // cross-horizon replay is exactly the residue the downstream
      // idempotent-MERGE sink absorbs
      events.dropDuplicates(keys)

  /** Stream-stream event-time interval join: attribute each purchase to
    * every click by the SAME user in the preceding `horizonSec` seconds
    * — the conversion-attribution join. The time bound lives INSIDE the
    * join condition (not a post-filter) so the streaming planner can
    * derive state-eviction watermarks for both sides: click state is
    * held only `horizonSec + delay`, purchase state only `delay` —
    * bounded state, O(events in horizon) per side, never O(history).
    *
    * Scale shape (batch and micro-batch alike): one shuffle of each
    * side on user_id, then a per-key time-range probe; output is
    * pairs-within-horizon-sized, never the cross product. Runs
    * unchanged on batch DataFrames — the oracle seam — while
    * EventStreamsSpec drives the watermarked streaming path.
    *
    * `joinType` extends the same plan to outer attribution: with
    * `left_outer`, a click with no purchase in its horizon emits once
    * with null purchase columns — in streaming ONLY after the watermark
    * proves no match can still arrive (the null row is a watermark
    * decision, not a timeout guess). */
  def intervalJoin(
      events: DataFrame,
      leftType: String = "click",
      rightType: String = "purchase",
      horizonSec: Long = 3600L,
      watermarkDelay: String = "2 hours",
      joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr(s"INTERVAL $horizonSec SECOND"),
      joinType)
      // coalesce the two user keys: identical when matched, and under
      // full_outer a purchase-only row carries only p_user_id
      .select(coalesce(col("user_id"), col("p_user_id")).as("user_id"),
        col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"),
        (graft.functions.Transforms.microsOf(col("purchase_ts")) -
          graft.functions.Transforms.microsOf(col("click_ts")))
          .as("gap_us"))
  }

  /** Stream-stream event-time LEFT SEMI interval join: each click that
    * CONVERTS (≥1 same-user purchase within the following `horizonSec`)
    * emits exactly once, with no purchase columns — the converted-click
    * feed. Same bounded two-sided state as [[intervalJoin]] (the time
    * bound lives inside the join condition so both sides' state
    * eviction derives from the watermark), but the semi form never
    * multiplies output by the purchase count: at 100 TB the output is
    * clicks-sized, not pairs-sized, and a click's state can retire as
    * soon as its first match emits.
    *
    * Streaming semantics: the click emits when its FIRST match arrives
    * (no watermark wait — unlike the outer join's null rows, presence
    * needs no proof of absence). Batch-run it IS the EXISTS subquery,
    * which is the oracle seam. */
  def intervalSemiJoin(
      events: DataFrame,
      leftType: String = "click",
      rightType: String = "purchase",
      horizonSec: Long = 3600L,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr(s"INTERVAL $horizonSec SECOND"),
      "left_semi")
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long)

  case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  /** Full-microsecond epoch value of a Timestamp. Event timestamps carry
    * microseconds (and the oracle compares full precision), so both the
    * sort key and the gap test must use micros — Timestamp.getTime alone
    * (millis) would glue together events whose true gap is gapMs plus
    * sub-millisecond micros, and mis-order same-millisecond events. */
  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Gap-based sessionization with EXPLICIT custom state
    * (`flatMapGroupsWithState`): a closed session is emitted as soon as
    * an event more than `gapMs` past the session end arrives for the
    * key; the open session rides in `GroupState` across micro-batches.
    *
    * Scale shape: one shuffle on user_id; state is O(1) per active key
    * (just the open session aggregate, never the events). Events inside
    * a micro-batch are sorted per key in memory — bounded by per-key
    * batch volume, not history. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = Math.multiplyExact(gapMs, 1000L)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[Session]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val closed = Seq.newBuilder[Session]
          var open = state.getOption
          for (e <- sorted) {
            open match {
              case Some(s) if micros(e.ts) - micros(s.session_end) <= gapMicros =>
                open = Some(s.copy(session_end = e.ts, n_events = s.n_events + 1))
              case Some(s) =>
                closed += s
                open = Some(Session(uid, e.ts, e.ts, 1))
              case None =>
                open = Some(Session(uid, e.ts, e.ts, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }

  case class TypedEvent(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String)

  case class Attached(user_id: Long, purchase_id: Long,
      click_id: Option[Long], gap_us: Option[Long])

  case class Alert(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

  /** Hysteresis threshold ALERTING with one-bit-per-key state: a key
    * alerts when its value crosses `high` while ARMED, then stays
    * silenced until a value at or below `low` re-arms it — the standard
    * monitoring semantics that suppresses alert storms while a metric
    * hovers above threshold. State is a single boolean per key, carried
    * across micro-batches in `GroupState`; within a batch events process
    * in event-time order. Batch-executed it equals the gaps-and-islands
    * SQL (an alert is a high event whose latest preceding high-or-low
    * event is a low, or that has none), which is the oracle seam. */
  def thresholdAlerts(
      events: DataFrame,
      high: Double,
      low: Double): Dataset[Alert] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("value").cast("double"))
      .as[(Long, Timestamp, Long, Double)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Boolean, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Timestamp, Long, Double)],
         state: GroupState[Boolean]) =>
          val sorted = rows.toSeq.sortBy(r => (micros(r._2), r._1))
          var armed = state.getOption.getOrElse(true)
          val out = Seq.newBuilder[Alert]
          for ((eid, ts, _, value) <- sorted) {
            if (value >= high && armed) {
              out += Alert(uid, eid, ts, value)
              armed = false
            } else if (value <= low) armed = true
          }
          state.update(armed)
          out.result().iterator
      }
  }

  /** Stream-static enrichment join: every micro-batch joins against the
    * CURRENT state of the static (batch) side — Structured Streaming
    * re-plans the static relation per batch, so a dimension table
    * updated between batches enriches later events with the new rows.
    * The dim side is broadcast: no stream-side shuffle, no state. */
  def staticEnrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)

  case class FunnelState(
      signupTs: Option[Timestamp],
      clickTs: Option[Timestamp],
      purchaseTs: Option[Timestamp])

  case class FunnelRow(
      user_id: Long,
      stage: Int,
      signup_ts: Timestamp,
      click_ts: Option[Timestamp],
      purchase_ts: Option[Timestamp])

  /** Streaming conversion funnel (signup → click → purchase) with
    * EXPLICIT per-user state: a stage advances only on an event STRICTLY
    * after the previous stage's first event — q33's batch semantics,
    * held incrementally. State is O(1) per user (three timestamps); a
    * user emits a fresh progress row in every micro-batch that advances
    * their stage, so the sink always holds the latest funnel position.
    *
    * Within a micro-batch events process in event-time order (in-batch
    * disorder absorbed); across batches a late-arriving earlier event
    * cannot rewind a stage — the same documented enrichment tradeoff as
    * [[asofAttach]]. Batch-executed there is one "batch", so the output
    * is exactly the per-user funnel table the q33-style SQL derives. */
  def funnelProgress(events: Dataset[TypedEvent]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "signup" || e.event_type == "click" ||
        e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[TypedEvent], state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val before = state.getOption.getOrElse(FunnelState(None, None, None))
          var st = before
          for (e <- sorted) e.event_type match {
            case "signup" if st.signupTs.isEmpty =>
              st = st.copy(signupTs = Some(e.ts))
            case "click" if st.clickTs.isEmpty &&
              st.signupTs.exists(t0 => micros(e.ts) > micros(t0)) =>
              st = st.copy(clickTs = Some(e.ts))
            case "purchase" if st.purchaseTs.isEmpty &&
              st.clickTs.exists(t0 => micros(e.ts) > micros(t0)) =>
              st = st.copy(purchaseTs = Some(e.ts))
            case _ =>
          }
          if (st == before) Iterator.empty
          else {
            state.update(st)
            val stage =
              if (st.purchaseTs.isDefined) 3
              else if (st.clickTs.isDefined) 2
              else 1
            Iterator.single(
              FunnelRow(uid, stage, st.signupTs.get, st.clickTs, st.purchaseTs))
          }
      }
  }

  /** Streaming AS-OF enrichment with EXPLICIT custom state: each
    * purchase attaches the user's latest click at-or-before it. State is
    * O(1) per key — just the newest click seen — which is the streaming
    * form of the backward as-of join (`Merge.asofJoin` is the batch
    * window form; both are oracle-checked against the same DuckDB ASOF
    * JOIN).
    *
    * Within a micro-batch events process in event-time order, so
    * in-batch disorder is absorbed; ACROSS micro-batches the attachment
    * is best-effort (a click arriving after the purchase's batch cannot
    * retroactively attach — the documented enrichment-join tradeoff;
    * exact cross-batch event-time ordering needs the interval-join
    * operator instead). In batch execution everything is one "batch",
    * so the semantics are exactly the as-of join. */
  def asofAttach(events: Dataset[TypedEvent]): Dataset[Attached] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Timestamp), Attached](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[TypedEvent],
         state: GroupState[(Long, Timestamp)]) =>
          // clicks sort before purchases at the same timestamp: inclusive
          val sorted = rows.toSeq.sortBy(e =>
            (micros(e.ts), if (e.event_type == "click") 0 else 1, e.event_id))
          val out = Seq.newBuilder[Attached]
          var latest = state.getOption
          for (e <- sorted) {
            if (e.event_type == "click")
              latest = Some((e.event_id, e.ts))
            else
              out += Attached(uid, e.event_id, latest.map(_._1),
                latest.map(c => micros(e.ts) - micros(c._2)))
          }
          latest.foreach(state.update)
          out.result().iterator
      }
  }
}
