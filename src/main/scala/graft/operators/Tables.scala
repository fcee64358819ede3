package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Table access helpers for the testdata star schema. */
object Tables {

  /** Session-lifetime SCHEMA cache for the IMMUTABLE testdata tables
    * (r18 perf): every bare `spark.read.parquet(path)` runs a footer
    * schema-inference job plus its driver planning gap (~50-100 ms
    * measured per read site), and the battery re-inferred the same six
    * static schemas hundreds of times — pure per-query fixed cost at any
    * scale (a catalog would hold the schema; this is the path-based
    * equivalent). Data is still read from parquet on every execution —
    * only the STRUCT TYPE is cached, keyed by (dir, table, nanosAsLong)
    * since that legacy flag changes what inference returns. Never use
    * for mutable run-dir tables. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), org.apache.spark.sql.types.StructType]()

  /** Read an immutable testdata table with the cached schema (one
    * inference per (dir, table) per JVM; an explicit schema skips the
    * footer-inference job on every later read). */
  def read(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val nanos = s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    val schema = schemaCache.computeIfAbsent((dir, name, nanos),
      _ => s.read.parquet(path).schema)
    s.read.schema(schema).parquet(path)
  }

  /** The events table has shipped with two parquet timestamp generations:
    * TIMESTAMP(NANOS), which Spark 4 refuses to read natively (sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and we rebuild the
    * microsecond timestamp with exact integer division — a double division
    * would lose precision at 1e18-nanosecond magnitudes), and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads as
    * TIMESTAMP_NTZ and needs no rewrite.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = read(s, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }

  /** Spread a frame across the session's shuffle parallelism before a
    * per-row-EXPENSIVE kernel (multi-hash signatures, image/audio codec
    * work, all-pairs BroadcastNestedLoopJoin streams). The graded sf
    * parquet is a single row group, so every downstream kernel otherwise
    * inherits ONE input split and runs serially on one core (guide §2.5
    * input skew — "one huge unsplittable file: repartition immediately
    * after the read"). Hash-partitioned on `key` (deterministic under
    * retries — no round-robin sort, no rand()), sized by the session's
    * shuffle-partition conf so the dial stays scale-adaptive: at
    * production split counts the same shuffle is what a repartition
    * before a CPU-bound kernel costs anyway, and the rows moved here are
    * the THIN pre-kernel columns, never the kernel's output (guide §8:
    * decide/shuffle on small rows, compute heavy bytes after). */
  def spread(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, key)

  /** Epoch microseconds of a timestamp column of EITHER flavor.
    * `unix_micros` rejects TIMESTAMP_NTZ outright, so cast through the
    * session-zoned type first: identity for TIMESTAMP, and for
    * TIMESTAMP_NTZ an interpretation in the session time zone — every
    * graft session pins `spark.sql.session.timeZone=UTC`, which makes the
    * result the naive value's own micros, exactly what DuckDB's
    * `epoch_us` returns for a naive parquet timestamp.
    */
  def epochMicros(c: Column): Column = unix_micros(c.cast(TimestampType))
}
