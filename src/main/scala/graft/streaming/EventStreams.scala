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
/** Per-group session buffer: raw (event-time millis, value) pairs awaiting
  * watermark passage, stored as parallel sequences. Buffering raw events —
  * rather than a folded (start, end) accumulator — is what makes the
  * operator correct under event-time disorder: the watermark admits late
  * events anywhere inside the open window, including BEFORE the current
  * session start, so no fold is final until the watermark has passed it.
  * State is bounded by (watermark delay × per-user event rate), the same
  * bound Spark's built-in session_window aggregation carries.
  * Top-level: Spark's state encoder generates bytecode that needs public
  * accessors, so this cannot be a private nested class.
  */
case class SessionBuffer(ts: Seq[Long], value: Seq[Double])

/** Per-user funnel buffer: raw (event-time micros, event type) pairs
  * awaiting the quiet-gap seal (same rationale as [[SessionBuffer]]: the
  * funnel's chained minima are order-sensitive, and a late view can
  * re-qualify earlier clicks, so no fold is final while admissible events
  * remain possible).
  */
case class FunnelBuffer(us: Seq[Long], tpe: Seq[String])

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
    * no event from the user (event time). A session is emitted only once
    * the WATERMARK has passed `session_end + gap` — the point after which
    * no admissible event can extend it, merge into it, or split it.
    *
    * Emitting eagerly on a later same-user event (the naive fold) is wrong
    * under disorder: the watermark explicitly admits up to `watermark` of
    * lateness, so an event older than the current session start — or
    * falling inside a gap that eagerly closed a session — can still arrive.
    * Raw events are therefore buffered in state and folded on every
    * invocation; only the prefix of sessions that the watermark has sealed
    * is emitted, and the unsealed tail of events stays buffered.
    *
    * State per user is the unsealed event tail — bounded by the watermark
    * delay × per-user event rate; unbounded users scale horizontally
    * because state is partitioned by group key.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long,
                 watermark: String = "2 hours"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    // Fold time-sorted (ts, value) pairs into contiguous gap-delimited runs.
    def fold(uid: Long, evs: Array[(Long, Double)]): Seq[(Session, Array[(Long, Double)])] = {
      val out = Seq.newBuilder[(Session, Array[(Long, Double)])]
      var runStart = 0
      var i = 1
      while (i <= evs.length) {
        if (i == evs.length || evs(i)._1 - evs(i - 1)._1 > gapMs) {
          val run = evs.slice(runStart, i)
          out += ((Session(uid, new Timestamp(run.head._1), new Timestamp(run.last._1),
            run.length, run.iterator.map(_._2).sum), run))
          runStart = i
        }
        i += 1
      }
      out.result()
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuffer, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[SessionBuffer]) =>
          val wm = state.getCurrentWatermarkMs()
          val prior = state.getOption
            .map(b => b.ts.iterator.zip(b.value.iterator).toArray)
            .getOrElse(Array.empty[(Long, Double)])
          val all = (prior ++ batch.map(e => (e.ts.getTime, e.value)))
            .sortBy(_._1)
          if (all.isEmpty) {
            if (state.hasTimedOut) state.remove()
            Iterator.empty
          } else {
            // A run is sealed once wm >= end + gap: every admissible future
            // event has ts > wm >= end + gap, so it can neither extend the
            // run nor start anything at or before it.
            val (finished, open) = fold(uid, all).partition {
              case (s, _) => s.session_end.getTime + gapMs <= wm
            }
            if (open.isEmpty) state.remove()
            else {
              val tail = open.iterator.flatMap(_._2).toArray
              state.update(SessionBuffer(tail.map(_._1).toSeq, tail.map(_._2).toSeq))
              // Wake when the EARLIEST open run becomes sealable — later
              // runs re-arm on that invocation. (Timeout timestamps must
              // sit strictly beyond the current watermark.)
              val earliestSeal = open.head._1.session_end.getTime + gapMs
              state.setTimeoutTimestamp(math.max(earliestSeal, wm + 1))
            }
            finished.iterator.map(_._1)
          }
      }
  }

  case class FunnelRow(user_id: Long, view_us: Option[Long],
                       click_us: Option[Long], purchase_us: Option[Long],
                       funnel_depth: Int)

  /** Streaming twin of the q_e4 ordered funnel: per user, the earliest
    * view, the earliest click at-or-after it, and the earliest purchase
    * at-or-after that — emitted once the user has been quiet for
    * `quietSeconds` of event time AND the watermark has sealed that quiet
    * gap, after which no admissible event can change the row (a late view
    * could otherwise lower `view_us` and re-qualify earlier clicks, so the
    * chain is only final behind the watermark).
    *
    * Raw (micros, type) pairs buffer in state and the batch fold runs at
    * seal time — bit-identical chaining to the batch query, which is what
    * the spec pins (stream under full disorder ≡ q_e4's window fold).
    * State per user is the unsealed event tail, bounded by watermark
    * delay × per-user rate, evicted on emit.
    */
  def funnel(events: Dataset[Event], quietSeconds: Long,
             watermark: String = "2 hours"): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

    def foldFunnel(uid: Long, evs: Array[(Long, String)]): FunnelRow = {
      val view = evs.iterator.filter(_._2 == "view").map(_._1).minOption
      val click = view.flatMap(v =>
        evs.iterator.filter(e => e._2 == "click" && e._1 >= v).map(_._1).minOption)
      val purchase = click.flatMap(c =>
        evs.iterator.filter(e => e._2 == "purchase" && e._1 >= c).map(_._1).minOption)
      val depth =
        if (purchase.isDefined) 3
        else if (click.isDefined) 2
        else if (view.isDefined) 1
        else 0
      FunnelRow(uid, view, click, purchase, depth)
    }

    val quietMs = quietSeconds * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuffer, FunnelRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[FunnelBuffer]) =>
          val wm = state.getCurrentWatermarkMs()
          val prior = state.getOption
            .map(b => b.us.iterator.zip(b.tpe.iterator).toArray)
            .getOrElse(Array.empty[(Long, String)])
          val all = (prior ++ batch.map(e => (us(e.ts), e.event_type)))
            .sortBy(_._1)
          if (all.isEmpty) {
            if (state.hasTimedOut) state.remove()
            Iterator.empty
          } else {
            val lastMs = all.last._1 / 1000L
            if (wm >= lastMs + quietMs) {
              state.remove()
              Iterator.single(foldFunnel(uid, all))
            } else {
              state.update(FunnelBuffer(all.map(_._1).toSeq, all.map(_._2).toSeq))
              state.setTimeoutTimestamp(math.max(lastMs + quietMs, wm + 1))
              Iterator.empty
            }
          }
      }
  }

  /** Stream-stream interval join: pair every click with each view by the
    * same user in the preceding `attributionWindow`. Both inputs carry
    * watermarks and the join condition bounds click_ts relative to view_ts,
    * which is exactly what lets Spark evict a buffered view once the
    * watermark passes `view_ts + attributionWindow` (and a buffered click
    * once it passes `click_ts`) — the bounded-state contract stream-stream
    * joins require; without the time bound, both sides buffer forever.
    * On batch frames the watermarks are no-ops and the same code path is
    * the q_e3 batch twin, so stream and batch semantics can't drift.
    */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
                      attributionWindow: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame = {
    val v = views.select(col("event_id").as("view_id"),
        col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("click_user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    v.join(c,
        col("user_id") === col("click_user_id") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr(s"INTERVAL $attributionWindow"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Stream-static enrichment: left-join the event stream against a small
    * static dimension via broadcast hash join. No streaming state at all —
    * the dimension is (re)broadcast per micro-batch, so dimension updates
    * between batches are picked up and executor memory holds only the dim.
    */
  def enrichEvents(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Windowed TOP-K over the stream (trending keys): per tumbling
    * event-time window, the k most frequent values of `keyCol` with
    * (count DESC, key) tie-break. Built as the watermarked windowed
    * count (state = windows x distinct keys, evicted on watermark
    * passage, same bound as [[hourlyRollup]]) in APPEND mode — a window's
    * counts emit exactly once, when the watermark seals it — followed by
    * a per-window rank in the foreachBatch sink, where the sealed
    * window's frame is tiny (distinct keys of ONE window). Emitting
    * top-k mid-window would be wrong under disorder: a late-but-admitted
    * event can reorder ranks until the seal, which is why the rank runs
    * on sealed windows only.
    */
  def windowedTopK(events: DataFrame, keyCol: String, k: Int,
                   windowLength: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))

  /** The per-sealed-window rank step of [[windowedTopK]] — runs inside
    * foreachBatch (or as a batch query over the materialized counts).
    */
  def topKOfWindows(counts: DataFrame, keyCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("window_start")
      .orderBy(col("n").desc, col(keyCol))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
