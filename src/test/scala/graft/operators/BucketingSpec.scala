package graft.operators

import graft.SparkTestBase
import java.nio.file.Files

/** Co-located joins via bucketing: two tables bucketed on the join key must
  * join with NO shuffle exchange — the pre-partitioning lever that replaces
  * per-query shuffles for repeatedly-joined fact tables at scale.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    // external-table paths under /tmp; warehouse dir is a static conf and
    // irrelevant when an explicit path is given
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val li = spark.read.parquet(sfDir("0.001") + "/lineitem.parquet")
    val ord = spark.read.parquet(sfDir("0.001") + "/orders.parquet")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_bucketed").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_bucketed").saveAsTable("ord_bucketed")

    // disable broadcast so the join would otherwise be a shuffled SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          spark.table("li_bucketed")("l_orderkey") === spark.table("ord_bucketed")("o_orderkey"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
