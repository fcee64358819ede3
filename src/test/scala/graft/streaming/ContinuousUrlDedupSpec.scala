package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** First-seen URL dedup through real micro-batches: messy spellings fold
  * within and across batches, recrawls emit nothing, state survives
  * batches.
  */
class ContinuousUrlDedupSpec extends SparkTestBase {

  import ContinuousUrlDedup._

  test("first capture of a page emits once; recrawls and respellings never re-emit") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Capture]
    val q = firstSeen(input.toDS())
      .writeStream.format("memory").queryName("firstseen")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: page A in two messy spellings (ids 7, 3) + page B
      input.addData(
        Capture(7L, "https://user:pw@example.com/a?x=1&utm_source=f"),
        Capture(3L, "HTTPS://WWW.EXAMPLE.COM:443/a?x=1#frag"),
        Capture(5L, "https://example.org/b"))
      q.processAllAvailable()
      val b1 = spark.table("firstseen").as[FirstSeen].collect()
        .map(f => f.canonical_url -> f.first_doc_id).toMap
      assert(b1.size == 2)
      assert(b1("https://example.com/a?x=1") == 3L) // min id within batch
      assert(b1("https://example.org/b") == 5L)

      // batch 2: page A recrawled (new id, third spelling) + new page C
      input.addData(
        Capture(11L, "https://example.com/a/?x=1"),
        Capture(12L, "https://example.org/c"))
      q.processAllAvailable()
      val all = spark.table("firstseen").as[FirstSeen].collect()
      assert(all.length == 3, s"recrawl re-emitted: ${all.mkString(", ")}")
      assert(all.map(_.canonical_url).contains("https://example.org/c"))

      // batch 3: only recrawls -> nothing new
      input.addData(Capture(20L, "https://example.org/b?"),
        Capture(21L, "https://example.org/c#f"))
      q.processAllAvailable()
      assert(spark.table("firstseen").count() == 3)
    } finally q.stop()
  }
}
