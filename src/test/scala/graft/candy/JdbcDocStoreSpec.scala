package graft.candy

import graft.SparkTestBase
import graft.sources.DocumentStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S3/S5 exercised end-to-end against embedded Derby (its jars ship with
  * Spark for the Hive metastore — a real JDBC engine, no network), S4/S6
  * against the file-backed fake document store, and the S9 seeding driver
  * over both. These are the paths the reference drives against MySQL and
  * MongoDB (src/data_processor.py:137-145, :155-179, :198-255, :257-293).
  */
class JdbcDocStoreSpec extends SparkTestBase {

  private val fakeDocFormat = classOf[graft.sources.FakeDocStoreProvider].getName
  private def derbyUrl(name: String): String = {
    val dir = Files.createTempDirectory(s"graft-derby-$name")
    s"jdbc:derby:$dir/db;create=true"
  }
  private val dataset = "/root/reference/data/dataset_32"

  test("JDBC write + read round-trips through embedded Derby") {
    val url = derbyUrl("roundtrip")
    val products = Ingest.readProducts(spark, s"$dataset/products.csv")
    Ingest.writeJdbc(products, url, "products")
    val back = Ingest.readJdbc(spark, url, "products")
    assert(back.count() == products.count())
    val want = products.orderBy("product_id").collect().map(_.toSeq).toSeq
    val got = back.orderBy("product_id").collect().map(_.toSeq).toSeq
    assert(got == want, "JDBC round-trip must preserve every row and value")
  }

  test("JDBC overwrite replaces the table contents") {
    val url = derbyUrl("overwrite")
    val customers = Ingest.readCustomers(spark, s"$dataset/customers.csv")
    Ingest.writeJdbc(customers, url, "customers")
    Ingest.writeJdbc(customers.limit(3), url, "customers")
    assert(Ingest.readJdbc(spark, url, "customers").count() == 3)
  }

  test("document-store write + read round-trips via the option contract") {
    import spark.implicits._
    val uri = s"file://${Files.createTempDirectory("graft-docstore")}"
    val df = Seq((1L, "lollipop", 2.5), (2L, "taffy", 0.75))
      .toDF("id", "name", "price")
    DocumentStore.writeCollection(df, uri, "candy", "inventory",
      format = fakeDocFormat)
    val back = DocumentStore.readCollection(spark, uri, "candy", "inventory",
      format = fakeDocFormat)
    assert(back.count() == 2)
    assert(back.orderBy("id").select("name").as[String].collect().toSeq ==
      Seq("lollipop", "taffy"))
  }

  test("SeedDatabase seeds JDBC tables and per-day collections like the reference") {
    val url = derbyUrl("seed")
    val uri = s"file://${Files.createTempDirectory("graft-seed-doc")}"
    val (tables, collections) =
      SeedDatabase.seed(spark, dataset, url, docUri = uri,
        docDatabase = "candy_store", docFormat = fakeDocFormat)
    assert(tables == Seq("customers", "products"))
    assert(collections.nonEmpty && collections.forall(_.startsWith("transactions_")))
    // relational side readable with the reference's row counts
    assert(Ingest.readJdbc(spark, url, "customers").count() ==
      Ingest.readCustomers(spark, s"$dataset/customers.csv").count())
    // document side: a seeded day reads back with its transactions intact
    val day = DocumentStore.readCollection(spark, uri, "candy_store",
      collections.head, format = fakeDocFormat)
    val direct = spark.read.schema(Schemas.transactions)
      .option("multiLine", value = true)
      .json(s"$dataset/${collections.head}.json")
    assert(day.count() == direct.count())
    assert(day.select(countDistinct("transaction_id")).head().getLong(0) ==
      direct.select(countDistinct("transaction_id")).head().getLong(0))
  }

  test("readCollections unions per-day collections, tolerating schema drift") {
    import spark.implicits._
    val uri = s"file://${Files.createTempDirectory("graft-multicoll")}"
    DocumentStore.writeCollection(
      Seq((1L, "gummy"), (2L, "mint")).toDF("id", "name"),
      uri, "candy", "day_20240101", format = fakeDocFormat)
    DocumentStore.writeCollection(
      // day 2 drifts: an extra discount column appears
      Seq((3L, "cola", 0.1)).toDF("id", "name", "discount"),
      uri, "candy", "day_20240102", format = fakeDocFormat)
    val all = DocumentStore.readCollections(spark, uri, "candy",
      Seq("day_20240101", "day_20240102"), format = fakeDocFormat)
    assert(all.count() == 3)
    // source tagging keeps the ingest date recoverable
    assert(all.filter(col("_collection") === "day_20240101").count() == 2)
    // drifted column is null for days that lack it, present where written
    assert(all.filter(col("discount").isNotNull).count() == 1)
    assert(all.filter(col("id") === 1).select("discount").head().isNullAt(0))
  }
}
