package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
