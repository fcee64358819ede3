package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.Timestamp

/** The foreachBatch JDBC sink must deliver each micro-batch exactly once
  * into the table — including when a batch is re-executed after a
  * failure, which Structured Streaming is allowed to do.
  */
class StreamSinksSpec extends SparkTestBase {

  import EventStreams.Event

  private def ts(minutes: Long): Timestamp = new Timestamp((1440 + minutes) * 60000L)

  test("micro-batches land in JDBC exactly once, even when re-executed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = s"jdbc:derby:${Files.createTempDirectory("sink-derby")}/db;create=true"
    val sink = StreamSinks.jdbcBatchSink(url, "events_out")

    val input = MemoryStream[Event]
    val q = input.toDS().toDF().writeStream.foreachBatch(sink).start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(2), 1, "purchase", 3.0))
      q.processAllAvailable()
      val read = () => spark.read.jdbc(url, "events_out", new java.util.Properties())
      assert(read().count() == 3)

      // a failure-replay of batch 1: same batchId, same data — must converge
      val replay = spark.createDataset(Seq(Event(3, ts(2), 1, "purchase", 3.0))).toDF()
      sink(replay, 1L)
      assert(read().count() == 3, "re-executed batch must not duplicate rows")
      assert(read().select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
