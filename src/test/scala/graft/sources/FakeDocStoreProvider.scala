package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, RelationProvider, TableScan}
import org.apache.spark.sql.types.StructType

/** File-backed fake document store for tests: honors the same option
  * contract as the MongoDB v10 connector (connection.uri / database /
  * collection) but persists each collection as JSON under
  * `{uri without file://}/{database}/{collection}/`. Exists to prove
  * DocumentStore plumbs options through Spark's source API correctly —
  * the container ships neither a Mongo server nor its connector jar.
  */
class FakeDocStoreProvider extends RelationProvider with CreatableRelationProvider {

  private def collectionPath(parameters: Map[String, String]): String = {
    val uri = parameters.getOrElse("connection.uri",
      sys.error("fake doc store: connection.uri option missing"))
    val db = parameters.getOrElse("database",
      sys.error("fake doc store: database option missing"))
    val coll = parameters.getOrElse("collection",
      sys.error("fake doc store: collection option missing"))
    s"${uri.stripPrefix("file://")}/$db/$coll"
  }

  private def relationFor(sqlCtx: SQLContext, df: DataFrame): BaseRelation =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = sqlCtx
      override def schema: StructType = df.schema
      override def buildScan(): RDD[Row] = df.rdd
    }

  override def createRelation(sqlCtx: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    relationFor(sqlCtx, sqlCtx.sparkSession.read.json(collectionPath(parameters)))

  override def createRelation(sqlCtx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    data.write.mode(mode).json(collectionPath(parameters))
    relationFor(sqlCtx, data)
  }
}
