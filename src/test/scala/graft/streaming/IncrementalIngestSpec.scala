package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Exactly-once incremental ingestion: only new files are processed per
  * run, reruns with no new input are no-ops, and a transform rides along.
  */
class IncrementalIngestSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("day", StringType),
    StructField("amount", DoubleType)))

  test("each run drains only newly-arrived files, exactly once") {
    val root = Files.createTempDirectory("incr").toString
    val src = s"$root/src"; val dst = s"$root/dst"; val ckp = s"$root/ckp"
    Files.createDirectories(Paths.get(src))

    def writeDay(day: String, ids: Range): Unit =
      Files.writeString(Paths.get(src, s"$day.json"),
        ids.map(i => s"""{"id": $i, "day": "$day", "amount": ${i * 1.5}}""")
          .mkString("", "\n", "\n"))

    def ingest(): Unit = IncrementalIngest.runAvailableNow(
      spark, src, schema, dst, ckp,
      transform = _.filter(col("amount") >= 0).withColumn("doubled", col("amount") * 2))

    writeDay("2024-01-01", 0 until 10)
    ingest()
    assert(spark.read.parquet(dst).count() == 10)

    // a second run with no new files must be a no-op (no duplicates)
    ingest()
    assert(spark.read.parquet(dst).count() == 10)

    // day 2 arrives: only its rows are appended
    writeDay("2024-01-02", 100 until 105)
    ingest()
    val after = spark.read.parquet(dst)
    assert(after.count() == 15)
    assert(after.filter(col("day") === "2024-01-01").count() == 10)
    assert(after.filter(col("day") === "2024-01-02").count() == 5)
    // ids are unique: nothing was reprocessed
    assert(after.select("id").distinct().count() == 15)
    // the transform applied to every batch
    assert(after.filter(col("doubled") =!= col("amount") * 2).isEmpty)
  }
}
