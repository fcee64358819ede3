package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Runtime row-level filtering: for a shuffle join with a selective filter
  * on one side, Spark can inject a bloom filter built from the filtered
  * side into the other side's scan — rows that can't join are dropped
  * BEFORE the exchange. At 100 TB this is the difference between shuffling
  * the whole fact table and shuffling the ~matching slice, without any
  * hand-written semi-join.
  */
class RuntimeFilterSpec extends SparkTestBase {

  test("a selective dim filter injects a bloom runtime filter into the fact scan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // small testdata: lower the size gates so the injection logic engages
    conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    try {
      val li = spark.read.parquet(sfDir("0.01") + "/lineitem.parquet")
      val ord = spark.read.parquet(sfDir("0.01") + "/orders.parquet")
        .filter(col("o_totalprice") > 400000) // selective, non-key filter
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val planned = joined.queryExecution.optimizedPlan.toString
      assert(planned.contains("bloom_filter") || planned.contains("BloomFilter") ||
        planned.contains("might_contain"),
        s"no runtime bloom filter injected:\n$planned")
      // and the result matches the un-filtered-plan answer
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
