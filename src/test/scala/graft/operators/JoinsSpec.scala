package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Semantic checks for the as-of / interval / salted join operators. */
class JoinsSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(m: Long) = new Timestamp(m * 60000L)

  test("asOfJoin attaches latest at-or-before right row per key") {
    val left = Seq((1L, ts(10), "a"), (1L, ts(20), "b"), (2L, ts(5), "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(10), 100.0), (1L, ts(15), 150.0), (2L, ts(6), 200.0))
      .toDF("k", "t", "v")
    val out = Joins.asOfJoin(left, right, "k", "t")
      .select("tag", "asof_v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toMap
    assert(out("a") == 100.0, "equal timestamp matches (inclusive)")
    assert(out("b") == 150.0, "latest prior wins")
    assert(out("c") == -1.0, "no prior right row -> null")
  }

  test("asOfJoin breaks right-side timestamp ties deterministically") {
    val left = Seq((1L, ts(20), "x")).toDF("k", "t", "tag")
    // three right rows at the SAME (key, time): the largest (v, w) tuple
    // must win, independent of input or shuffle order
    val rightRows = Seq((1L, ts(10), 100.0, "a"), (1L, ts(10), 300.0, "c"),
      (1L, ts(10), 200.0, "b"))
    for (perm <- rightRows.permutations.toSeq) {
      val out = Joins.asOfJoin(left, perm.toDF("k", "t", "v", "w"), "k", "t")
        .select("asof_v", "asof_w").head()
      assert((out.getDouble(0), out.getString(1)) == ((300.0, "c")),
        s"tie-break flapped for input order $perm")
    }
  }

  test("withinInterval finds exactly the brute-force pairs") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 300L).map(i => (i, new Timestamp(rnd.nextInt(2000000).toLong)))
    val df = rows.toDF("id", "t")
    val got = Joins.withinInterval(df, "id", "t", 10000L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (a, ta) <- rows; (b, tb) <- rows
      if a < b && math.abs(ta.getTime - tb.getTime) <= 10000L
    } yield (a, b)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("saltedJoin result equals plain join") {
    val fact = spark.read.parquet(sfDir("0.001") + "/lineitem.parquet")
      .withColumnRenamed("l_partkey", "p_partkey")
    val dim = spark.read.parquet(sfDir("0.001") + "/part.parquet")
      .select("p_partkey", "p_brand")
    val salted = Joins.saltedJoin(fact, dim, "p_partkey", 8,
        pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(8)))
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = fact.join(dim, "p_partkey")
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
