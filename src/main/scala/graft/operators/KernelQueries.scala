package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The sequential fulfillment kernel generalized to the TPC-H testdata, with
  * a recursive-CTE DuckDB oracle — so the engine's one genuinely
  * non-declarative operator is still oracle-checked, not just rows-counted.
  *
  * Semantics: treat `part` as inventory (stock = p_size * 50) and `lineitem`
  * as time-ordered requests per part (ordered by l_shipdate, l_orderkey,
  * l_linenumber). A request is fulfilled in full iff 0 < qty <= available,
  * else cancelled (same fold as graft.candy.Fulfillment).
  */
object KernelQueries {

  case class Req(l_orderkey: Long, l_linenumber: Int, l_partkey: Long,
                 qty: Int, ord: Long)
  case class Out(l_orderkey: Long, l_linenumber: Int, l_partkey: Long,
                 fulfilled: Int)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_k1_fulfillment" -> ((s, dir) => {
      import s.implicits._
      val stock = Tables.read(s, dir, "part")
        .select(col("p_partkey"), (col("p_size") * 50).as("stock"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val stockB = s.sparkContext.broadcast(stock)
      Tables.read(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity").cast("int").as("qty"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("ord"))
        .as[Req]
        .repartition(col("l_partkey"))
        .sortWithinPartitions("l_partkey", "ord", "l_orderkey", "l_linenumber")
        .mapPartitions { rows =>
          var pid = Long.MinValue
          var available = 0
          rows.map { r =>
            if (r.l_partkey != pid) {
              pid = r.l_partkey
              available = stockB.value.getOrElse(pid, 0)
            }
            val f = if (available > 0 && r.qty <= available) { available -= r.qty; r.qty }
                    else 0
            Out(r.l_orderkey, r.l_linenumber, r.l_partkey, f)
          }
        }
        .toDF()
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // include partkey + fulfilled for a total output order.
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "fulfilled")
    })
  )

  val oracles: Map[String, String] = Map(
    // Row-by-row sequential fold expressed as a recursive CTE: state carries
    // (partkey, row-rank, available-before-this-row).
    "q_k1_fulfillment" ->
      """WITH RECURSIVE req AS (
        |  SELECT l_partkey AS pk, l_orderkey, l_linenumber,
        |         CAST(l_quantity AS INTEGER) AS qty,
        |         row_number() OVER (PARTITION BY l_partkey
        |           ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem),
        |inv AS (SELECT p_partkey AS pk, p_size * 50 AS stock FROM part),
        |state(pk, rn, available) AS (
        |  SELECT pk, 0, stock FROM inv
        |  UNION ALL
        |  SELECT s.pk, r.rn,
        |         CASE WHEN s.available > 0 AND r.qty <= s.available
        |              THEN s.available - r.qty ELSE s.available END
        |  FROM state s JOIN req r ON r.pk = s.pk AND r.rn = s.rn + 1)
        |SELECT r.l_orderkey, r.l_linenumber, r.pk AS l_partkey,
        |       CASE WHEN s.available > 0 AND r.qty <= s.available
        |            THEN r.qty ELSE 0 END AS fulfilled
        |FROM req r JOIN state s ON s.pk = r.pk AND s.rn = r.rn - 1
        |ORDER BY r.l_orderkey, r.l_linenumber, l_partkey, fulfilled""".stripMargin
  )
}
