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
}
