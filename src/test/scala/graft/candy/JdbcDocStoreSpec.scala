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

  /** Dialect matrix: every embedded engine whose JDBC driver is on the
    * classpath. Derby always (its jars ship with Spark for the Hive
    * metastore); DuckDB from the test classpath — a genuinely foreign
    * dialect (columnar engine, its own DDL type mapping, served by Spark's
    * DEFAULT JdbcDialect rather than the built-in DerbyDialect, so the two
    * legs exercise different quoting/DDL code paths in Spark too). H2 and
    * HSQLDB join automatically when present; this build's offline
    * dependency cache carries neither (`"com.h2database" % "h2"` fails
    * `sbt update` with ResolveException — verified, not an omission), but
    * the assertions are engine-generic and the matrix widens with the
    * classpath, no test changes needed.
    */
  private val engines: Seq[(String, String => String)] = {
    graft.sources.DuckDbDialect.ensureRegistered()
    def ifPresent(driver: String, entry: (String, String => String)) =
      try { Class.forName(driver); Seq(entry) }
      catch { case _: ClassNotFoundException => Seq.empty }
    Seq("derby" -> ((n: String) => derbyUrl(n))) ++
      ifPresent("org.duckdb.DuckDBDriver", "duckdb" -> ((n: String) =>
        s"jdbc:duckdb:${Files.createTempDirectory(s"graft-duckdb-$n")}/db")) ++
      ifPresent("org.h2.Driver", "h2" -> ((n: String) =>
        s"jdbc:h2:${Files.createTempDirectory(s"graft-h2-$n")}/db")) ++
      ifPresent("org.hsqldb.jdbc.JDBCDriver", "hsqldb" -> ((n: String) =>
        s"jdbc:hsqldb:file:${Files.createTempDirectory(s"graft-hsqldb-$n")}/db"))
  }

  test("dialect matrix: DECIMAL, TIMESTAMP, DATE and nulls round-trip exactly") {
    import spark.implicits._
    val rows = Seq(
      (1L, BigDecimal("1234567890.12"), java.sql.Timestamp.valueOf("2024-02-29 23:59:59.123456"),
        java.sql.Date.valueOf("2024-02-29")),
      (2L, BigDecimal("-0.01"), java.sql.Timestamp.valueOf("1999-01-01 00:00:00"),
        java.sql.Date.valueOf("1999-01-01")))
    val df = rows.toDF("id", "amount", "at", "day")
      .withColumn("amount", col("amount").cast("decimal(12,2)"))
      .unionByName(Seq(3L).toDF("id")
        .select(col("id"), lit(null).cast("decimal(12,2)").as("amount"),
          lit(null).cast("timestamp").as("at"), lit(null).cast("date").as("day")))
    for ((engine, url) <- engines) {
      val u = url("types")
      Ingest.writeJdbc(df, u, "typed_vals")
      val back = Ingest.readJdbc(spark, u, "typed_vals")
      // DECIMAL scale/precision must survive the dialect's DDL mapping
      assert(back.schema("amount").dataType ==
        org.apache.spark.sql.types.DecimalType(12, 2),
        s"[$engine] decimal type mangled: ${back.schema("amount").dataType}")
      val want = df.orderBy("id").collect().map(_.toSeq).toSeq
      val got = back.orderBy("id").collect().map(_.toSeq).toSeq
      assert(got == want, s"[$engine] typed round-trip diverged:\n$got\nvs\n$want")
    }
  }

  test("dialect matrix: quoted mixed-case and reserved-word identifiers survive") {
    import spark.implicits._
    // "Order" is a reserved word everywhere; "unitPrice" must keep its case.
    val df = Seq((1L, "lollipop", 2.5), (2L, "taffy", 0.75))
      .toDF("Order", "name", "unitPrice")
    for ((engine, url) <- engines) {
      val u = url("idents")
      // the dbtable option is passed through verbatim, so the caller quotes
      // mixed-case table names; Spark's dialect quotes every COLUMN name in
      // the DDL and DML it generates.
      Ingest.writeJdbc(df, u, "\"OrderItems\"")
      val back = Ingest.readJdbc(spark, u, "\"OrderItems\"")
      assert(back.schema.fieldNames.toSeq == Seq("Order", "name", "unitPrice"),
        s"[$engine] identifier case mangled: ${back.schema.fieldNames.toSeq}")
      assert(back.orderBy("Order").select("unitPrice").as[Double].collect().toSeq
        == Seq(2.5, 0.75), s"[$engine] values lost through quoted identifiers")
      // an unquoted name must NOT collide with the quoted mixed-case table
      Ingest.writeJdbc(df.limit(1), u, "orderitems_plain")
      assert(Ingest.readJdbc(spark, u, "\"OrderItems\"").count() == 2,
        s"[$engine] quoted table clobbered by unquoted write")
    }
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
