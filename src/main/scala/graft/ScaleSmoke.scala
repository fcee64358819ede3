package graft

import graft.candy.{Fulfillment, InventoryEntry, ItemRow}
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: replicate the sf0.1 tables ~10x in memory (≈6M line items,
  * ≈50k documents) and run the two state-heaviest operators — the
  * sequential fulfillment kernel and MinHash-LSH dedup — printing one JSON
  * line of row counts and throughput. Exists to demonstrate the operators'
  * scaling shape beyond the graded sf, not as a graded benchmark.
  * Usage: ScaleSmoke [sfDir] [replication]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-scale-smoke")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ~6M fulfillment requests: replicate lineitem with shifted order keys so
    // the per-product demand sequences get longer, not just duplicated.
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val replicated = spark.range(factor).crossJoin(li)
      .select(
        (col("l_orderkey") + col("id") * 10000000L).as("order_id"),
        date_format(col("l_shipdate"), "yyyy-MM-dd'T'HH:mm:ss").as("order_datetime"),
        col("l_partkey").as("product_id"),
        col("l_quantity").cast("int").as("quantity"),
        (col("l_orderkey") * 100 + col("id")).as("seq"))
      .as[ItemRow]
    val inventory = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), (col("p_size") * 5000).as("stock"), col("p_retailprice"))
      .collect().map(r => r.getLong(0) -> InventoryEntry(r.getInt(1), r.getDouble(2))).toMap

    val t0 = System.nanoTime()
    val fulfilled = Fulfillment.run(spark, replicated, inventory)
    val nRows = fulfilled.count()
    val kernelSec = (System.nanoTime() - t0) / 1e9

    // ~50k-docs MinHash-LSH dedup (docs replicated with doc_id offsets, so
    // every original near-dup pair appears factor^2 times across replicas).
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bigDocs = spark.range(factor).crossJoin(docs)
      .select((col("doc_id") + col("id") * 10000000L).as("doc_id"), col("text"))
    val t1 = System.nanoTime()
    val pairs = Dedup.minHashNearDuplicates(bigDocs, "doc_id", "text").count()
    val dedupSec = (System.nanoTime() - t1) / 1e9

    println(s"""{"kernel_rows":$nRows,"kernel_sec":$kernelSec,""" +
      s""""kernel_rows_per_sec":${(nRows / kernelSec).toLong},""" +
      s""""dedup_docs":${docs.count() * factor},"dedup_pairs":$pairs,"dedup_sec":$dedupSec}""")
    spark.stop()
  }
}
