package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** S4/S6 — document-store source/sink. The reference mirrors each day's
  * transactions through MongoDB collections and reads them back per
  * collection (reference src/data_processor.py:155-179 write, :226-255
  * read), addressing a collection as `{uri}/{database}.{collection}`.
  *
  * This is the same passthrough shape as the JDBC helpers: Spark's
  * pluggable source API does the work, and the connector is selected by
  * `format`. The default targets the public MongoDB Spark connector's v10
  * option surface (format "mongodb" with connection.uri / database /
  * collection options); any DataSource implementing that option contract —
  * including the file-backed fake used in tests, where no Mongo server or
  * connector jar exists — plugs in via the `format` parameter. Collection
  * reads partition via the connector's own partitioner options (passed
  * through `extraOptions`), so scale behavior is the connector's, not ours.
  */
object DocumentStore {

  def readCollection(spark: SparkSession, uri: String, database: String,
                     collection: String, format: String = "mongodb",
                     extraOptions: Map[String, String] = Map.empty): DataFrame =
    spark.read.format(format)
      .option("connection.uri", uri)
      .option("database", database)
      .option("collection", collection)
      .options(extraOptions)
      .load()

  /** The reference's per-day read loop (src/data_processor.py:226-255):
    * read every named collection and union them. Day-to-day schema drift
    * is tolerated (`unionByName` with missing-column nulls), and each row
    * is tagged with its source collection so the ingest date stays
    * recoverable — the loop itself is driver-side over collection NAMES
    * only; every read and the union remain fully distributed.
    */
  def readCollections(spark: SparkSession, uri: String, database: String,
                      collections: Seq[String], format: String = "mongodb",
                      extraOptions: Map[String, String] = Map.empty,
                      tagColumn: Option[String] = Some("_collection")): DataFrame = {
    require(collections.nonEmpty, "readCollections needs at least one collection")
    collections.map { c =>
      val df = readCollection(spark, uri, database, c, format, extraOptions)
      tagColumn.fold(df)(t => df.withColumn(t, lit(c)))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  def writeCollection(df: DataFrame, uri: String, database: String,
                      collection: String, format: String = "mongodb",
                      mode: String = "overwrite",
                      extraOptions: Map[String, String] = Map.empty): Unit =
    df.write.format(format)
      .option("connection.uri", uri)
      .option("database", database)
      .option("collection", collection)
      .options(extraOptions)
      .mode(mode)
      .save()
}
