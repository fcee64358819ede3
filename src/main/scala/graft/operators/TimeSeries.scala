package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a dense daily
  * grid per key and forward-fill observation gaps. The fill uses the
  * fill-group trick — a running count of non-null observations partitions
  * each key's timeline into [observation, gap...] runs, and a per-group max
  * broadcasts the observation over its run — so the whole operator is two
  * keyed windows plus one join: no UDFs, no driver-side series, scales per
  * key like any windowed aggregation.
  */
object TimeSeries {

  /** As-of join: for every left row, the LATEST right row with
    * `right.tsCol <= left.tsCol` on the same key (the standard
    * quotes-to-trades temporal join; DuckDB/kdb `ASOF JOIN`, pandas
    * `merge_asof`).
    *
    * Spark-first shape: no range join, no per-row subquery. Both sides are
    * tagged and UNIONED, shuffled ONCE on the key, sorted by (ts, side)
    * with right rows ordered before left rows at equal timestamps (so a
    * tie matches — the join is inclusive), and the right payload is
    * carried forward with a running `last(_, ignoreNulls)` over a
    * rows-frame window — O(1) state per row, the same merge-scan an MPP
    * as-of join runs. At 100 TB this costs exactly one shuffle of
    * left+right on the key and a per-partition sort; state never exceeds
    * one right payload per key.
    *
    * Output: every left column, then `<prefix>ts` (the matched right
    * timestamp) and `<prefix><v>` for each requested right value column —
    * all null when a left row has no right row at or before it.
    *
    * Determinism requires unique (key, ts) pairs on the RIGHT (aggregate
    * first otherwise); equal-key-equal-ts right duplicates would make
    * "the latest" ill-defined in any as-of engine.
    *
    * `toleranceUs`: optionally null out matches older than the left
    * timestamp by more than this many microseconds (pandas
    * `merge_asof(tolerance=...)`).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               rightValCols: Seq[String], prefix: String = "asof_",
               toleranceUs: Option[Long] = None): DataFrame = {
    val carryCols = col(rightTsCol).as("_rts") +: rightValCols.map(col)
    val rCarry = right.select(struct(carryCols: _*).as("_carry"))
    val lRow = left.select(struct(left.columns.map(col): _*).as("_lrow"))
    val ru = right.select(
      col(keyCol).as("_k"), col(rightTsCol).as("_ats"), lit(0).as("_side"),
      struct(carryCols: _*).as("_carry"),
      lit(null).cast(lRow.schema("_lrow").dataType).as("_lrow"))
    val lu = left.select(
      col(keyCol).as("_k"), col(leftTsCol).as("_ats"), lit(1).as("_side"),
      lit(null).cast(rCarry.schema("_carry").dataType).as("_carry"),
      struct(left.columns.map(col): _*).as("_lrow"))
    val w = Window.partitionBy("_k").orderBy("_ats", "_side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = ru.unionByName(lu)
      .withColumn("_m", last("_carry", ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val bounded = toleranceUs match {
      case Some(tol) => matched.withColumn("_m",
        when(col("_m").isNotNull &&
          Tables.epochMicros(col("_ats")) -
            Tables.epochMicros(col("_m._rts")) <= tol,
          col("_m")))
      case None => matched
    }
    val outCols = left.columns.map(c => col(s"_lrow.$c").as(c)) ++
      (col("_m._rts").as(s"${prefix}ts") +:
        rightValCols.map(v => col(s"_m.$v").as(s"$prefix$v")))
    bounded.select(outCols: _*)
  }

  /** Slowly-changing-dimension type-2 history build: turn a change log
    * (one row per key per change event) into versioned dimension rows with
    * `valid_from` / `valid_to` half-open intervals and an `is_current`
    * flag — the standard temporal-table shape a lake-side dimension load
    * produces.
    *
    * `valid_from` is the row's own change timestamp; `valid_to` is the
    * NEXT change's timestamp for the same key (null on the current row),
    * via one `lead` over a (key)-partitioned window — one shuffle on the
    * key, O(1) window state, no self-join. `tieBreakCols` must make
    * (key, ts, tieBreak...) unique, or version order at equal timestamps
    * would be nondeterministic.
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
           tieBreakCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy((col(tsCol) +: tieBreakCols.map(col)): _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }

  /** Daily resample + forward fill. Output: (key, day, v_filled, was_gap)
    * for every day between each key's first and last observation; `v` is
    * the per-day max of `valueCol` (deterministic under reordering).
    */
  def resampleDaily(events: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(max(col(valueCol)).as("_v"))
    val spans = daily.groupBy(col(keyCol))
      .agg(min("day").as("_d0"), max("day").as("_d1"))
    val grid = spans.select(col(keyCol),
      explode(expr("sequence(_d0, _d1, interval 1 day)")).as("day"))
    val joined = grid.join(daily, Seq(keyCol, "day"), "left")
    // non-null running count = fill group id; its max carries the value
    val withGrp = joined.withColumn("_grp",
      count("_v").over(Window.partitionBy(keyCol).orderBy("day")))
    withGrp
      .withColumn("v_filled",
        max("_v").over(Window.partitionBy(col(keyCol), col("_grp"))))
      .withColumn("was_gap", col("_v").isNull.cast("int"))
      .select(col(keyCol), col("day"), col("v_filled"), col("was_gap"))
  }

  /** Interval MERGE (the gaps-and-islands shape): per key, overlapping or
    * touching [start, end] intervals coalesce into islands; returns one
    * row per key with the island count, total interval count, and total
    * covered span — the utilization/coverage primitive (user active time,
    * machine busy windows, sensor uptime) that range joins and
    * sessionization don't give you.
    *
    * Algorithm: one key-ordered window pass — an interval OPENS a new
    * island iff its start exceeds the running max end of everything
    * before it (ties in start order cannot flip the flag: an equal-start
    * predecessor's end already covers the start); the island id is the
    * running sum of open flags. All integer arithmetic on the interval
    * bounds — hash-replayable.
    *
    * Scale shape: ONE shuffle on the key; the running max, the island
    * numbering, and both aggregations reuse the exchange. O(1) window
    * state per row.
    */
  def intervalIslands(df: DataFrame, keyCol: String, startCol: String,
                      endCol: String): DataFrame = {
    val ordered = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(ordered.rowsBetween(Window.unboundedPreceding, -1))
    val islands = df
      .withColumn("_open",
        when(col(startCol) > coalesce(prevMax, lit(Long.MinValue)), 1L)
          .otherwise(0L))
      .withColumn("_island", sum("_open")
        .over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as("_s"), max(col(endCol)).as("_e"),
        count(lit(1)).as("_n"))
    islands.groupBy(keyCol)
      .agg(sum("_n").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("_e") - col("_s")).as("covered"))
  }

  /** Behavioral TRAINING-SEQUENCE construction: per key, the
    * chronologically-ordered token sequence (first `maxLen` events, joined
    * with `sep`) plus the untruncated event count — the event-stream →
    * model-input step of sequential-recommendation / user-model training
    * data builds.
    *
    * Determinism: order is (tsCol, tieCol) — tieCol must be unique per key
    * (an event id), making the order total, the truncation exact, and the
    * string replayable by any engine. The collected structs carry the rank,
    * and `array_sort` restores the total order regardless of collect_list's
    * arrival order.
    *
    * Scale shape: ONE shuffle on the key; the rank window, the count
    * window, and the aggregation all reuse that exchange (same
    * partitioning key). Rows beyond `maxLen` are dropped BEFORE the
    * collect, so per-key aggregation state is bounded by maxLen — a
    * pathological hot key costs a window scan, never an unbounded buffer.
    */
  def eventSequences(events: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, tokenCol: String, maxLen: Int,
                     sep: String = ">"): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    val byKey = Window.partitionBy(keyCol)
    val ordered = byKey.orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("_rn", row_number().over(ordered))
      .withColumn("n_events", count(lit(1)).over(byKey))
      .filter(col("_rn") <= maxLen)
      .groupBy(col(keyCol), col("n_events"))
      .agg(concat_ws(sep,
        expr(s"transform(array_sort(collect_list(struct(_rn, $tokenCol))), x -> x.$tokenCol)"))
        .as("seq"))
      .select(col(keyCol), col("n_events"), col("seq"))
  }
}
