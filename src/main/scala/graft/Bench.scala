package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE machine-parseable JSON line. Failures are never swallowed:
  * each failing query is recorded in an "errors" map (name -> exception
  * class + message) and still contributes its elapsed time, so a broken
  * query can't masquerade as a fast one. The same JSON line is also
  * written to bench_out.json so sbt log prefixes can't break driver
  * parsing of stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JVM/codegen/shuffle/Hadoop-FS init otherwise lands on
    // whichever query happens to iterate first — a scan alone is not enough,
    // so exercise a hash agg, an exchange, and a broadcast join once.
    val wl = spark.read.parquet(s"$sfDir/lineitem.parquet")
    wl.groupBy("l_returnflag").agg(org.apache.spark.sql.functions.sum("l_quantity")).count()
    wl.limit(1000)
      .join(org.apache.spark.sql.functions.broadcast(
        wl.select("l_orderkey").limit(10)), "l_orderkey")
      .count()

    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    val timed = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = timed.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errs = timed.collect { case (k, _, Some(m)) => s""""$k":"${esc(m)}"""" }
      .mkString("{", ",", "}")
    val total = timed.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_errors":${timed.count(_._3.isDefined)},"sf":"${esc(sfDir)}"}"""
    println(line)
    Files.writeString(Paths.get("bench_out.json"), line + "\n")
    if (timed.exists(_._3.isDefined)) {
      System.err.println(s"[bench] ${timed.count(_._3.isDefined)} queries failed — see errors map")
    }
    spark.stop()
  }
}
