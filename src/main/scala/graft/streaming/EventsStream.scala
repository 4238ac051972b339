package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming versions of the event operators in
  * [[graft.ext.Events]]: watermarked tumbling-window aggregation and
  * stateful gap sessionization via flatMapGroupsWithState.
  *
  * The reference's `/query/async` endpoint is an unimplemented stub
  * (/root/reference/app_server.py:281-289) — this module is part of the
  * north-star extension surface, built on readStream → transform →
  * writeStream so the same logical shapes run over Kafka/files at scale.
  */
object EventsStream {

  /** Hourly tumbling-window counts with a watermark: late events beyond
    * `lateness` are dropped and state for closed windows is purged —
    * bounded state at any scale.
    *
    * Output schema and arithmetic match the batch [[graft.ext.Events.hourly]]
    * exactly (stringified hour, decimal-accumulated sum) so the streaming
    * result is certifiable against the same external oracle. */
  def hourlyCounts(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    hourlyAgg(events, "event_type", lateness)

  /** The oracle-certified watermark → hourly window → decimal-accumulated
    * aggregate → stringified-hour block, shared by every streaming entry
    * that hash-matches a batch SQL oracle: the exact arithmetic and hour
    * format MUST stay identical everywhere or one query's certification
    * silently diverges. */
  private def hourlyAgg(events: DataFrame, keyCol: String,
                        lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col(keyCol), col("n"), col("sum_value"))

  /** Stream-static enrichment + windowed aggregate: the streaming fact
    * joins a broadcast STATIC dimension before a watermarked tumbling
    * aggregate — the canonical "enrich events with dims as they arrive"
    * topology. A stream-static inner join keeps no join state at all (only
    * the aggregate holds watermark-bounded state), the static side is
    * re-planned per micro-batch, and the broadcast means the stream never
    * shuffles for the join at any scale. */
  def hourlyBySegment(events: DataFrame, dim: DataFrame,
                      lateness: String = "2 hours"): DataFrame =
    hourlyAgg(
      events.join(broadcast(dim), col("user_id") === col("c_custkey")),
      "c_mktsegment", lateness)

  /** Streaming exact deduplication: the first occurrence of each
    * (hour window, user, event_type) key is emitted, later duplicates
    * dropped. The window column carries event-time, so the watermark lets
    * Spark purge a key's dedup state once its window falls behind the
    * allowed lateness — BOUNDED state at any scale, the property that makes
    * streaming dedup deployable (a keys-live-forever dropDuplicates grows
    * state monotonically until the job dies).
    *
    * Batch dual: SELECT DISTINCT hour, user_id, event_type — the oracle
    * for the `stream_dedup` entry. */
  def dedupKeys(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .select(window(col("ts"), "1 hour").as("win"),
        col("user_id"), col("event_type"))
      .dropDuplicates("win", "user_id", "event_type")
      .select(date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("user_id"), col("event_type"))

  /** Watermarked stream-stream interval join: every (view, click) pair of
    * the same user with the click inside `gapMinutes` after the view —
    * the attribution join, and the one genuinely stream×stream operator
    * in the surface (everything else joins a static side).
    *
    * Both inputs carry watermarks and the join condition bounds
    * click_ts − view_ts on BOTH sides, which is exactly what lets Spark
    * prove when a buffered view can no longer match any future click and
    * purge it: state is bounded by lateness + gap, not by stream length.
    * An unbounded-condition stream-stream join would buffer forever —
    * the deployability line this operator exists to demonstrate.
    *
    * Batch dual (the oracle): the plain interval self-join — inner joins
    * emit exactly the matched pairs, so the drained result hash-matches
    * plain SQL. */
  def viewToClickJoin(events: DataFrame, gapMinutes: Int = 5,
                      lateness: String = "2 hours"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", lateness)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("__cu"), col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    views.join(clicks,
        col("user_id") === col("__cu") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") +
          expr(s"INTERVAL $gapMinutes MINUTES"))
      .select(col("user_id"),
        date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss").as("view_t"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_t"))
  }

  /** LEFT-OUTER variant of [[viewToClickJoin]] — the attribution shape
    * users actually run: every view emits, with NULL click columns when
    * no click landed in its window. Spark's watermarked outer interval
    * join emits an unmatched view only once the GLOBAL watermark
    * (min over both sides' event-time watermarks) passes `view_ts +
    * gap` — before that a matching click could still arrive, so the
    * null row would be premature. State stays bounded the same way the
    * inner join's does (the watermark evicts), and matched pairs emit
    * exactly as the inner join emits them. A finite drain therefore
    * certifies matched pairs in full plus the null rows of the
    * WATERMARK-FINALIZED prefix; views within `gap + lateness` of the
    * stream's end are still legitimately pending when the drain stops
    * (the oracle applies the identical cutoff). */
  def viewToClickJoinOuter(events: DataFrame, gapMinutes: Int = 5,
                           lateness: String = "0 seconds"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", lateness)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("__cu"), col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    views.join(clicks,
        col("user_id") === col("__cu") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") +
          expr(s"INTERVAL $gapMinutes MINUTES"),
        "left_outer")
      .select(col("user_id"),
        date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss").as("view_t"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_t"))
  }

  final case class Evt(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(nEvents: Long, start: Long, lastTs: Long)
  final case class SessionOut(user_id: Long, n_events: Long,
                              start_ms: Long, end_ms: Long)

  /** Stateful gap sessionization: per-user state via
    * flatMapGroupsWithState with an EVENT-TIME timeout — the streaming dual
    * of [[graft.ext.Events.sessions]]. A session closes when a later event
    * arrives past the gap, or when the WATERMARK passes lastTs + gap.
    *
    * Event-time (not processing-time) timeouts on purpose: they are
    * deterministic under replay/backfill — the same input stream always
    * yields the same sessions — and they don't keep the engine scheduling
    * no-data micro-batches (processing time always advances, so a
    * ProcessingTimeTimeout query never quiesces; observed as an endless
    * batch loop under Trigger.AvailableNow). At scale the watermark also
    * bounds state: closed-session state is purged as event time advances. */
  def sessionize(events: org.apache.spark.sql.Dataset[Evt],
                 gapMs: Long = 30L * 60 * 1000,
                 lateness: String = "0 seconds") = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Evt], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              SessionOut(user, s.nEvents, s.start, s.lastTs)).iterator
            state.remove()
            out
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1, lastTs = t))
                case Some(s) =>
                  closed ::= SessionOut(user, s.nEvents, s.start, s.lastTs)
                  cur = Some(SessionState(1, t, t))
                case None =>
                  cur = Some(SessionState(1, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close via watermark once event time moves past the gap
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
