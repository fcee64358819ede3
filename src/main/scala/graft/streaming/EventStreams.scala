package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over the events schema (the streaming
  * surface the reference defers to "future improvements" — README.md:101 —
  * built Spark-first here): watermarked tumbling-window rollups and
  * gap-based sessionization via flatMapGroupsWithState.
  *
  * Both transforms take the streaming DataFrame from any source
  * (readStream on files/kafka, or MemoryStream in tests) — source and sink
  * are the caller's concern, keeping the operators testable and reusable in
  * batch mode (same code path runs on a batch DataFrame).
  */
/** Mutable-per-group session accumulator (start/end in epoch millis).
  * Top-level: Spark's state encoder generates bytecode that needs public
  * accessors, so this cannot be a private nested class.
  */
case class SessionState(start: Long, end: Long, n: Int, total: Double)

object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int, total_value: Double)

  /** Tumbling 1-hour event-time windows with a watermark for state cleanup:
    * counts and value sums per (window, event_type). Late events beyond the
    * watermark are dropped — the streaming contract for bounded state.
    */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact deduplication by event_id with bounded state:
    * duplicates arriving within the watermark window are dropped, and state
    * for old ids is evicted once the watermark passes — the streaming twin
    * of batch dropDuplicates, with the memory bound a 100 TB/day stream
    * needs.
    */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Gap-based sessionization: a session closes when `gapSeconds` pass with
    * no event from the user (event time). Emits CLOSED sessions only —
    * closed either by a later event from the same user or by event-time
    * timeout once the watermark passes the gap.
    *
    * State per user is one (start, end, n, total) tuple — O(1), unbounded
    * users scale horizontally because state is partitioned by group key.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long,
                 watermark: String = "2 hours"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def close(uid: Long, s: SessionState): Session =
      Session(uid, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(close(uid, _))
            state.remove()
            out.iterator
          } else {
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption.orNull
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              if (cur == null) cur = SessionState(t, t, 1, e.value)
              else if (t - cur.end > gapSeconds * 1000L) {
                closed += close(uid, cur)
                cur = SessionState(t, t, 1, e.value)
              } else cur = SessionState(cur.start, math.max(cur.end, t),
                cur.n + 1, cur.total + e.value)
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.end + gapSeconds * 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
