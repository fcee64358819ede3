package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-layout utilities for the 100 TB posture: how data is laid out on
  * disk decides how much of it a query has to read. Three levers, composed
  * by [[writePartitioned]]:
  *
  *   - **Hive-style partition directories** (`partitionBy`): equality/IN
  *     filters on partition columns prune whole directories at planning
  *     time — the scan never lists them. This is the coarse-grained prune
  *     (per the reference's per-day collection layout,
  *     src/data_processor.py:226-255, re-expressed as date-partitioned
  *     files instead of per-day tables).
  *   - **Within-partition clustering** (`sortWithinPartitions` before
  *     write): parquet writes min/max stats per row group, so range
  *     predicates on the cluster column skip row groups inside each file.
  *   - **File sizing** (`maxRecordsPerFile` + `repartition`): a 100 TB
  *     table written from 10k tasks without sizing yields millions of tiny
  *     files (listing + open dominate) or a few huge ones (no read
  *     parallelism). Target files in the 100 MB–1 GB range.
  *
  * ORC passthroughs mirror the parquet entry points: Spark ships the ORC
  * datasource in-core, and both formats carry the same pushdown/pruning
  * contract, so the layout story is format-agnostic.
  */
object LakeLayout {

  /** Write `df` as a partitioned, clustered table. `partitionCols` become
    * hive-style directories; `clusterCols` are sorted within each output
    * task so row-group stats stay selective; `filesPerPartition` bounds
    * task fan-in, and `maxRecordsPerFile` caps file size from above.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       clusterCols: Seq[String] = Nil,
                       filesPerPartition: Int = 1,
                       maxRecordsPerFile: Long = 5000000L,
                       format: String = "parquet"): Unit = {
    // One shuffle: co-locate each output directory's rows into
    // `filesPerPartition` tasks (a deterministic row-hash salt fans a hot
    // directory out across tasks), then sort (partition dirs + cluster
    // cols) within each task so every task writes each directory once,
    // clustered.
    val keys = partitionCols.map(col) :+
      pmod(hash(df.columns.map(col): _*), lit(filesPerPartition))
    val shaped =
      if (partitionCols.isEmpty) df
      else df.repartition(
        df.sparkSession.sessionState.conf.numShufflePartitions, keys: _*)
    val sorted =
      if ((partitionCols ++ clusterCols).isEmpty) shaped
      else shaped.sortWithinPartitions((partitionCols ++ clusterCols).map(col): _*)
    sorted.write
      .format(format)
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .save(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
}
