package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Table access helpers for the testdata star schema. */
object Tables {

  /** The events table has shipped with two parquet timestamp generations:
    * TIMESTAMP(NANOS), which Spark 4 refuses to read natively (sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and we rebuild the
    * microsecond timestamp with exact integer division — a double division
    * would lose precision at 1e18-nanosecond magnitudes), and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads as
    * TIMESTAMP_NTZ and needs no rewrite.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }

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
