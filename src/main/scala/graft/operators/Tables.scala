package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table access helpers for the testdata star schema. */
object Tables {

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark 4 refuses to read natively; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and we rebuild the
    * microsecond timestamp here with exact integer division (a double
    * division would lose precision at 1e18-nanosecond magnitudes).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
}
