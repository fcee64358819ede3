package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Error bounds for the sketch aggregates: approximate results must sit
  * within their configured tolerance of the exact answers.
  */
class SketchSpec extends SparkTestBase {

  private lazy val li = spark.read.parquet(sfDir("0.01") + "/lineitem.parquet")

  test("HLL++ distinct counts within 3x configured relative error") {
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val rel = math.abs(approx(k) - e).toDouble / e
      assert(rel <= 0.06, s"$k: approx=${approx(k)} exact=$e rel=$rel")
    }
  }

  test("DataSketches HLL: daily-sketch union equals the direct global sketch") {
    val ev = Tables.events(spark, sfDir("0.01"))
    // partial per-day sketches, merged up
    val merged = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // one direct global sketch
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // HLL register merge is lossless: partial+union must EQUAL direct
    direct.foreach { case (k, d) =>
      assert(merged(k) == d, s"$k: merged=${merged(k)} direct=$d")
    }
    // and the estimate lands near the exact distinct count
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val rel = math.abs(direct(k) - e).toDouble / e
      assert(rel <= 0.05, s"$k: sketch=${direct(k)} exact=$e rel=$rel")
    }
  }

  test("approx_percentile within 2% rank error of exact percentile") {
    val approx = li.agg(
      expr("approx_percentile(l_extendedprice, 0.5, 10000)")).head().getDouble(0)
    // exact rank window for a 2% rank tolerance around the median
    val n = li.count()
    val below = li.filter(col("l_extendedprice") <= approx).count()
    val rank = below.toDouble / n
    assert(math.abs(rank - 0.5) <= 0.02, s"approx median $approx sits at rank $rank")
  }

  test("q_a16 gate bits survive adversarial repartitioning of the input") {
    // the GK estimate may move with partition merge order; the RANK-error
    // gate (p ± 0.04 at accuracy 100) must not — that is the contract the
    // driver hash pins
    val ord = spark.read.parquet(s"${sfDir("0.001")}/orders.parquet")
    for (parts <- Seq(1, 7, 32)) {
      val o = ord.repartition(parts)
      val approx = o.agg(expr(
        "approx_percentile(o_totalprice, array(0.25D, 0.5D, 0.9D), 100)"))
        .head().getSeq[Double](0)
      val n = o.count().toDouble
      Seq(0.25, 0.5, 0.9).zip(approx).foreach { case (p, a) =>
        val rank = o.filter(col("o_totalprice") <= a).count() / n
        assert(math.abs(rank - p) <= 0.04,
          s"parts=$parts p=$p approx=$a rank=$rank")
      }
    }
  }

  test("q_a16 gate bits hold under the query's own spread at the c8/c32 bench configs") {
    // r17 ADVICE: the in-query spread takes its partition count from
    // spark.sql.shuffle.partitions, and the driver benches at BOTH 32 and
    // 8 cores — replay the exact query shape (hash spread on the value
    // column, duplicates co-located) at those counts plus a stress value,
    // on the larger sf the oracle checks, and pin the okBit rank bounds.
    val ord10 = spark.read.parquet(s"${sfDir("0.01")}/orders.parquet")
      .select("o_totalprice")
    val n = ord10.count().toDouble
    for (parts <- Seq(4, 8, 32)) {
      val o = ord10.repartition(parts, col("o_totalprice"))
      val approx = o.agg(expr(
        "approx_percentile(o_totalprice, array(0.25D, 0.5D, 0.9D), 100)"))
        .head().getSeq[Double](0)
      // the query gates at p ± 0.04; a correct sketch must sit strictly
      // inside at every config the driver measures
      Seq(0.25, 0.5, 0.9).zip(approx).foreach { case (p, a) =>
        val rank = ord10.filter(col("o_totalprice") <= a).count() / n
        assert(math.abs(rank - p) <= 0.04,
          s"spread parts=$parts p=$p approx=$a rank=$rank")
      }
    }
  }
}
