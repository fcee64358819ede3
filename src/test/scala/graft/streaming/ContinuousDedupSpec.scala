package graft.streaming

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end continuous-ingestion dedup: two file waves through the
  * checkpointed stream must yield exactly the full-batch pair set, and a
  * rerun with no new files must change nothing.
  */
class ContinuousDedupSpec extends SparkTestBase {

  test("two ingestion waves accumulate exactly the full-batch near-dup pairs") {
    val docs = spark.read.parquet(sfDir("0.001") + "/documents.parquet")
      .select("doc_id", "text")
    val src = Files.createTempDirectory("cdsrc").toString
    val pairsDir = Files.createTempDirectory("cdpairs").toString + "/t"
    val indexDir = Files.createTempDirectory("cdindex").toString + "/t"
    val ckpt = Files.createTempDirectory("cdckpt").toString

    // glob: each wave lands in its own subdirectory
    def run(): Unit = ContinuousDedup.runAvailableNow(spark, src + "/*",
      docs.schema, "doc_id", "text", pairsDir, indexDir, ckpt)
    def pairSet() = spark.read.parquet(pairsDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // wave 1
    docs.filter(col("doc_id") < 30).coalesce(1).write.mode("overwrite")
      .json(src + "/w1")
    run()
    val afterW1 = pairSet()
    val expectW1 = Dedup.minHashNearDuplicates(
      docs.filter(col("doc_id") < 30), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterW1 == expectW1)

    // wave 2: new files only; history must not be recomputed, yet the
    // accumulated pairs equal the full-batch answer
    docs.filter(col("doc_id") >= 30).coalesce(1).write.mode("overwrite")
      .json(src + "/w2")
    run()
    val afterW2 = pairSet()
    val expectAll = Dedup.minHashNearDuplicates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterW2 == expectAll,
      s"accumulated=${afterW2.size} fullBatch=${expectAll.size}")
    assert(afterW2.size > afterW1.size, "wave 2 should add cross-wave pairs")

    // idempotence: rerun with nothing new
    run()
    assert(pairSet() == afterW2)
  }
}
