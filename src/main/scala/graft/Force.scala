package graft

/** Full-plan row counting for the timing harnesses.
  *
  * `df.count()` wraps the query in an `Aggregate(count(1))`, and Catalyst
  * then prunes every column the count doesn't need — correct for a count,
  * fatal for a benchmark: a query that ends in a bare projection (the
  * row-local operators: HTML extraction, classifier scoring, per-row
  * quality flags) collapses to a parquet-metadata row count and "measures"
  * 0.17 s flat at every corpus scale. Counting the plan's own output RDD
  * instead executes the query exactly as written — every output column is
  * evaluated into the produced rows, nothing above the query is added, and
  * aggregation-/join-ending queries cost the same as before.
  */
object Force {
  def rows(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()
}
