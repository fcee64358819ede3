package graft.sources

import graft.SparkTestBase
import java.nio.file.Files
import java.sql.DriverManager

/** High-watermark incremental JDBC extraction against embedded Derby:
  * predicate pushdown into the source, exactly-once materialization via
  * deterministic increment directories, crash-replay convergence.
  */
class JdbcIncrementalSpec extends SparkTestBase {

  private def freshDirs(): (String, String, String) = {
    val base = Files.createTempDirectory("graft-jdbc-inc")
    (s"jdbc:derby:$base/db;create=true", s"$base/state", s"$base/dest")
  }

  private def exec(url: String, sqls: String*): Unit = {
    val c = DriverManager.getConnection(url)
    try sqls.foreach { s => val st = c.createStatement(); st.execute(s); st.close() }
    finally c.close()
  }

  private def insert(url: String, rows: Range): Unit =
    exec(url, rows.map(i =>
      s"INSERT INTO events_src VALUES ($i, 'e$i')"): _*)

  test("incremental pulls fetch only new rows; reruns are no-ops; replays converge") {
    val (url, state, dest) = freshDirs()
    exec(url, "CREATE TABLE events_src (id BIGINT NOT NULL, payload VARCHAR(20))")
    insert(url, 1 to 5)

    assert(JdbcIncremental.pullIncrement(spark, url, "events_src", "id",
      state, dest) == 5L)
    assert(JdbcIncremental.lastWatermark(state).contains(5L))
    assert(JdbcIncremental.readMaterialized(spark, dest).count() == 5)

    // second batch: only the delta moves
    insert(url, 6 to 8)
    assert(JdbcIncremental.pullIncrement(spark, url, "events_src", "id",
      state, dest) == 3L)
    assert(JdbcIncremental.lastWatermark(state).contains(8L))
    val all = JdbcIncremental.readMaterialized(spark, dest)
    assert(all.count() == 8)
    assert(all.select("id").collect().map(_.getLong(0)).toSet == (1L to 8L).toSet)

    // nothing new -> zero rows, state untouched, no empty partition
    assert(JdbcIncremental.pullIncrement(spark, url, "events_src", "id",
      state, dest) == 0L)
    assert(JdbcIncremental.lastWatermark(state).contains(8L))
    assert(JdbcIncremental.readMaterialized(spark, dest).count() == 8)

    // crash BETWEEN data write and watermark commit: state rolls back to 5,
    // the re-pull rewrites the SAME increment=8 directory — no duplicates
    Files.write(java.nio.file.Paths.get(state, "watermark"),
      "5".getBytes("UTF-8"))
    assert(JdbcIncremental.pullIncrement(spark, url, "events_src", "id",
      state, dest) == 3L)
    val replayed = JdbcIncremental.readMaterialized(spark, dest)
    assert(replayed.count() == 8, "replay must converge, not duplicate")
    assert(JdbcIncremental.lastWatermark(state).contains(8L))
  }

  test("the watermark predicate is pushed into the source query") {
    val (url, state, dest) = freshDirs()
    exec(url, "CREATE TABLE events_src (id BIGINT NOT NULL, payload VARCHAR(20))")
    insert(url, 1 to 4)
    JdbcIncremental.pullIncrement(spark, url, "events_src", "id", state, dest)
    insert(url, 5 to 6)
    // the pushed dbtable is a subquery with the watermark bound inside —
    // Derby evaluates it; Spark never sees rows <= 4 at all
    val last = JdbcIncremental.lastWatermark(state).get
    val pushed = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"(SELECT * FROM events_src WHERE id > $last) t")
      .load()
    assert(pushed.count() == 2)
  }
}
