package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Continuous corpus ingestion WITH near-duplicate detection: each arriving
  * batch of documents is deduplicated against everything ingested before it
  * (via the persisted [[graft.operators.Dedup.lshIndex]] band-key state) and
  * then added to that index — the end-to-end shape of a training-corpus
  * intake pipeline. Cost per batch is O(batch ⋈ index) on band keys, never
  * a recompute over history.
  *
  * Exactly-once bookkeeping: the file source's checkpoint makes each input
  * file processed once; pair/index output is written to a `batch_id=`
  * hive partition per micro-batch with dynamic partition overwrite, so a
  * replayed batch overwrites its own partition instead of duplicating it
  * (same idempotence idiom as [[StreamSinks.jdbcBatchSink]]).
  */
object ContinuousDedup {

  /** Drain available new document files from `srcDir`; for each micro-batch
    * write exact-verified near-dup pairs (vs history + within batch) under
    * `pairsDir/batch_id=N/` and the batch's index rows under
    * `indexDir/batch_id=N/`. Returns after the backlog drains.
    */
  def runAvailableNow(spark: SparkSession, srcDir: String, schema: StructType,
                      idCol: String, textCol: String,
                      pairsDir: String, indexDir: String,
                      checkpointDir: String,
                      threshold: Double = 0.7): Unit = {
    val src = spark.readStream.schema(schema).format("json").load(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val hasIndex = new java.io.File(indexDir).exists() &&
          scala.util.Try(s.read.parquet(indexDir).isEmpty).toOption.contains(false)
        val pairs =
          if (hasIndex)
            Dedup.incrementalNearDuplicates(batch.toDF(),
              s.read.parquet(indexDir), idCol, textCol, threshold = threshold)
          else // first batch: nothing to compare against but itself
            Dedup.minHashNearDuplicates(batch.toDF(), idCol, textCol,
              threshold = threshold)
        val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try {
          pairs.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id").save(pairsDir)
          Dedup.lshIndex(batch.toDF(), idCol, textCol)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id").save(indexDir)
        } finally prev match {
          case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
