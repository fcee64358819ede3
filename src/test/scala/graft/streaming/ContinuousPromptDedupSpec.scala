package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** First-seen prompt dedup through real micro-batches: a prompt emits
  * once with its first VALID record, invalid records neither emit nor
  * shield, state survives batches.
  */
class ContinuousPromptDedupSpec extends SparkTestBase {

  import ContinuousPromptDedup._

  private def pair(p: String, c: String, r: String): String =
    s"""{"prompt":"$p","chosen":"$c","rejected":"$r"}"""

  test("a prompt emits once with its first valid record; invalid never emits or shields") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PrefRecord]
    val q = firstSeen(input.toDS())
      .writeStream.format("memory").queryName("firstpref")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: prompt A arrives INVALID first (equal branches, id 1),
      // then valid twice (ids 7 and 4) — the emit must be id 4; prompt B
      // arrives malformed only — nothing may emit for it yet
      input.addData(
        PrefRecord(1L, pair("prompt a", "same", "same")),
        PrefRecord(7L, pair("prompt a", "fine answer", "poor answer")),
        PrefRecord(4L, pair("prompt a", "good answer", "bad answer")),
        PrefRecord(2L, """{"prompt":"prompt b","chosen":"x"""))
      q.processAllAvailable()
      val b1 = spark.table("firstpref").as[FirstPref].collect()
      assert(b1.length == 1, s"expected one emit: ${b1.mkString(", ")}")
      assert(b1.head.rec_id == 4L)
      assert(b1.head.chosen_text == "<|user|>prompt a<|assistant|>good answer")

      // batch 2: prompt B now arrives VALID — the earlier malformed record
      // must not have shielded it; prompt A re-arrives valid — no re-emit
      input.addData(
        PrefRecord(9L, pair("prompt b", "yes", "no")),
        PrefRecord(10L, pair("prompt a", "later answer", "worse answer")))
      q.processAllAvailable()
      val b2 = spark.table("firstpref").as[FirstPref].collect()
      assert(b2.length == 2, s"expected two emits: ${b2.mkString(", ")}")
      assert(b2.map(_.rec_id).toSet == Set(4L, 9L))

      // batch 3: only repeats and junk -> nothing new
      input.addData(
        PrefRecord(20L, pair("prompt a", "q", "r")),
        PrefRecord(21L, "not json"))
      q.processAllAvailable()
      assert(spark.table("firstpref").count() == 2)
    } finally q.stop()
  }
}
