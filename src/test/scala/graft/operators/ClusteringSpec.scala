package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Integer k-means ([[Clustering.kmeansInt]]): exactness, determinism,
  * and structural invariants on small hand-checkable fixtures plus the
  * sf0.001 embeddings table.
  */
class ClusteringSpec extends SparkTestBase {

  import spark.implicits._

  private def twoBlobs = Seq(
    // blob A around (0.0, 0.0), blob B around (0.4, -0.4)
    (0L, Array(0.01f, 0.02f)), (1L, Array(0.40f, -0.41f)),
    (2L, Array(-0.02f, 0.01f)), (3L, Array(0.39f, -0.40f)),
    (4L, Array(0.02f, -0.01f)), (5L, Array(0.41f, -0.39f)),
    (6L, Array(0.00f, 0.00f)), (7L, Array(0.40f, -0.40f))
  ).toDF("vec_id", "embedding")

  test("k=2 separates two obvious blobs; cluster ids are the seed ids") {
    val out = Clustering.kmeansInt(twoBlobs, "vec_id", "embedding",
      k = 2, iterations = 2).collect()
    assert(out.length == 8)
    val byCluster = out.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    // seeds are ids 0 and 1; even ids are blob A (seed 0), odd blob B (seed 1)
    assert(byCluster.keySet == Set(0L, 1L))
    assert(byCluster(0L) == Set(0L, 2L, 4L, 6L))
    assert(byCluster(1L) == Set(1L, 3L, 5L, 7L))
  }

  test("k=1 inertia equals the hand-folded integer sum of squared dists") {
    val data = Seq(
      (0L, Array(0.1f, 0.2f)), (1L, Array(-0.3f, 0.0f)), (2L, Array(0.25f, -0.15f)))
    val df = data.toDF("vec_id", "embedding")
    // replay the operator's arithmetic in plain Scala: quantize, one mean
    // recompute from the all-in-one assignment, final distances
    def quant(a: Array[Float]): Array[Long] =
      a.map(x => math.round((x.toDouble + 1.0) * 1000000L.toDouble))
    val qs = data.map(d => quant(d._2))
    def meanOf(vs: Seq[Array[Long]]): Array[Long] =
      Array.tabulate(2)(i => vs.map(_(i)).sum / vs.size)
    // iterations = 2: both recomputes see ALL rows assigned to seed 0
    val c = meanOf(qs)
    val expected = qs.map(q => q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).sum
    val out = Clustering.kmeansInt(df, "vec_id", "embedding", k = 1, iterations = 2)
      .agg(sum("dist")).head().getLong(0)
    assert(out == expected)
  }

  test("assignment is invariant under repartitioning") {
    val emb = spark.read.parquet(s"${sfDir("0.001")}/embeddings.parquet")
    val a = Clustering.kmeansInt(emb, "vec_id", "embedding", k = 4, iterations = 2)
      .orderBy("vec_id").collect().toSeq
    val b = Clustering.kmeansInt(emb.repartition(7), "vec_id", "embedding",
      k = 4, iterations = 2).orderBy("vec_id").collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(0)).distinct.size == emb.count())
  }
}
