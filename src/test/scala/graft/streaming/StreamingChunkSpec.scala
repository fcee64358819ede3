package graft.streaming

import graft.SparkTestBase
import graft.operators.Pipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Chunking is stateless (posexplode + filters — no window, no agg), so the
  * SAME operator must run unchanged on a stream in append mode: ingestion-
  * time chunking of arriving documents is how a production training/RAG
  * pipeline actually calls it. Asserts streaming output == batch output
  * across micro-batches, including a doc arriving in a later batch.
  */
class StreamingChunkSpec extends SparkTestBase {

  test("chunkDocuments over a stream equals the batch result, append mode, no state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val batch1 = Seq((1L, words(45)), (2L, words(10)))
    val batch2 = Seq((3L, words(70)), (4L, ""))

    val input = MemoryStream[(Long, String)]
    val chunks = Pipeline.chunkDocuments(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text",
      chunkTokens = 30, strideTokens = 20)
    val q = chunks.writeStream.format("memory").queryName("stream_chunks")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      val afterB1 = spark.table("stream_chunks").count()
      assert(afterB1 > 0, "first micro-batch must emit chunks immediately (no buffering)")
      input.addData(batch2: _*); q.processAllAvailable()

      val streamed = spark.table("stream_chunks")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(5))).toSet
      val batch = Pipeline.chunkDocuments(
          (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text",
          chunkTokens = 30, strideTokens = 20)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(5))).toSet
      assert(streamed == batch)
      assert(batch.exists(_._1 == 3L) && !batch.exists(_._1 == 4L))
    } finally q.stop()
  }

  test("gopherRuleCard over a stream equals the batch result, append mode, no state") {
    // The quality gate is row-local like chunking, so ingestion-time
    // filtering of arriving documents runs the SAME operator unchanged.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def words(n: Int) = (1 to n).map(i => s"the word$i of that run").mkString(" ")
    val batch1 = Seq((1L, words(12)), (2L, "too short"))
    val batch2 = Seq((3L, words(20)), (4L, ""))

    val input = MemoryStream[(Long, String)]
    val card = graft.operators.TextAnalysis.gopherRuleCard(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", minWords = 50)
    val q = card.writeStream.format("memory").queryName("stream_gopher")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(r.fieldIndex("pass")))
      val streamed = spark.table("stream_gopher").collect().map(key).toSet
      val batch = graft.operators.TextAnalysis.gopherRuleCard(
          (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text",
          minWords = 50)
        .collect().map(key).toSet
      assert(streamed == batch && streamed.size == 4)
      // one row per input doc, including the empty-text one
      assert(streamed.map(_._1) == Set(1L, 2L, 3L, 4L))
    } finally q.stop()
  }
}
