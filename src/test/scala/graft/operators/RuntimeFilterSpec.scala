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

  test("explicit bloomPrunedJoin equals the plain join even when the bloom is FP-heavy") {
    import spark.implicits._
    val fact = (1L to 2000L).map(k => (k % 97, k)).toDF("key", "payload")
    val dim = Seq(3L, 11L, 42L).toDF("dkey").withColumn("tag", col("dkey") * 10)
    // 64 bits for 3 keys under xxhash64 smearing → plenty of false
    // positives; the equi-join must still make the result exact
    val got = Joins.bloomPrunedJoin(fact, dim, "key", "dkey",
        expectedItems = 3, fpp = 0.99)
      .select("key", "payload", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = fact.join(dim, col("key") === col("dkey"))
      .select("key", "payload", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("bloomPrunedJoin: null fact keys drop, empty dim yields empty result") {
    import spark.implicits._
    val fact = Seq(Some(1L), None, Some(2L)).toDF("key")
    val dim = Seq(1L).toDF("dkey")
    val got = Joins.bloomPrunedJoin(fact, dim, "key", "dkey", expectedItems = 1)
      .select("key").as[Long].collect().toSeq
    assert(got == Seq(1L))
    val empty = Joins.bloomPrunedJoin(fact, dim.filter(col("dkey") < 0),
      "key", "dkey", expectedItems = 1)
    assert(empty.count() == 0)
  }

  test("bloomPrunedJoin probes below the exchange (filter on the scan side)") {
    val li = spark.read.parquet(sfDir("0.01") + "/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val urgent = spark.read.parquet(sfDir("0.01") + "/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Joins.bloomPrunedJoin(li, urgent, "o_orderkey", "o_orderkey",
        expectedItems = 1L << 18).queryExecution.executedPlan
      // the might_contain predicate must sit INSIDE an exchange's subtree
      // (fact rows are dropped before they shuffle), not above the join
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val probeUnderShuffle = plan.collect {
        case e: ShuffleExchangeExec => e
      }.exists(_.child.toString.contains("might_contain"))
      assert(probeUnderShuffle,
        s"bloom probe not below an exchange:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
