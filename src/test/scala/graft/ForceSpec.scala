package graft

import org.apache.spark.sql.functions._

/** Pins the timing-harness forcing semantics (round 9): `df.count()` lets
  * Catalyst prune every column the count doesn't need, so a benchmark
  * forcing a projection-ending query that way measures a parquet footer
  * read (q_t26/q_t17 read 0.17 s FLAT at x1/x10/x30 before the fix).
  * [[Force.rows]] counts the plan's own output RDD instead, which must
  * evaluate every declared output column. The probe: a projected column
  * that THROWS on evaluation — pruned-away under count(), necessarily
  * raised under Force.rows.
  */
class ForceSpec extends SparkTestBase {

  // spark.range, not a local Seq: ConvertToLocalRelation evaluates
  // projections over a LocalRelation eagerly at optimization time, which
  // would raise even under count() and hide the pruning behavior.
  private def poisoned =
    spark.range(100)
      .select(col("id"),
        raise_error(lit("evaluated")).as("boom"))

  test("df.count() prunes a projection-only column (the harness trap)") {
    // Documents WHY Force exists: the poisoned column never runs.
    assert(poisoned.count() === 100L)
  }

  test("Force.rows evaluates every output column") {
    val e = intercept[Exception] { Force.rows(poisoned) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("evaluated")))
  }

  test("Force.rows returns the same row count as count() for unprunable plans") {
    val agg = spark.range(1000).groupBy((col("id") % 7).as("k"))
      .agg(sum("id").as("s"))
    assert(Force.rows(agg) === agg.count())
  }
}
