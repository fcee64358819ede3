package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** As-of join semantics against a hand-computed fixture plus plan-shape
  * and scale invariants (one shuffle, no range/cross join).
  */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  // trades: (key, t, trade_id) — the left side
  private def trades = Seq(
    ("a", 10L, 1L), ("a", 20L, 2L), ("a", 25L, 3L),
    ("b", 5L, 4L), ("b", 50L, 5L),
    ("c", 7L, 6L) // key with no quotes at all
  ).toDF("sym", "t", "trade_id")
    .withColumn("t", timestamp_micros(col("t")))

  // quotes: (key, t, px) — unique (key, t) by construction
  private def quotes = Seq(
    ("a", 10L, 1.0), ("a", 15L, 2.0), ("a", 30L, 3.0),
    ("b", 6L, 9.0)
  ).toDF("sym", "t", "px")
    .withColumn("t", timestamp_micros(col("t")))

  private def run(tolUs: Option[Long] = None) =
    TimeSeries.asOfJoin(trades, quotes, "sym", "t", "t", Seq("px"),
        toleranceUs = tolUs)
      .select(col("trade_id"), expr("unix_micros(asof_ts)").as("qt"),
        col("asof_px"))
      .orderBy("trade_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq

  test("as-of join picks the latest quote at-or-before each trade") {
    assert(run() == Seq(
      (1L, Some(10L), Some(1.0)), // tie: quote AT the trade time matches
      (2L, Some(15L), Some(2.0)), // latest of {10, 15}
      (3L, Some(15L), Some(2.0)), // quote at 30 is in the future
      (4L, None, None),           // b's first quote is later
      (5L, Some(6L), Some(9.0)),
      (6L, None, None)            // key never quoted
    ))
  }

  test("tolerance nulls out stale matches but keeps fresh ones") {
    // trade 5 is 44us after quote 6 — stale at tolerance 10us; trade 3
    // sits exactly AT the tolerance (25 - 15 = 10) and stays (inclusive).
    assert(run(tolUs = Some(10L)) == Seq(
      (1L, Some(10L), Some(1.0)),
      (2L, Some(15L), Some(2.0)),
      (3L, Some(15L), Some(2.0)),
      (4L, None, None),
      (5L, None, None),
      (6L, None, None)
    ))
  }

  test("plan shuffles once on the key and contains no cartesian/range join") {
    val plan = TimeSeries.asOfJoin(trades, quotes, "sym", "t", "t", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of join must not plan a product join:\n$plan")
    // one Exchange for the union's window partitioning; the final
    // orderBy in callers adds its own range exchange, not counted here
    val exchanges = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges:\n$plan")
  }

  test("every left row survives exactly once (left-join cardinality)") {
    val out = TimeSeries.asOfJoin(trades, quotes, "sym", "t", "t", Seq("px"))
    assert(out.count() == trades.count())
    assert(out.select("trade_id").distinct().count() == trades.count())
  }
}
