package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Exact frequent-item detection at bounded memory: keys occurring in at
  * least `theta` fraction of rows.
  *
  * The naive exact plan (`groupBy(key).count.filter`) shuffles EVERY
  * distinct key — at 100 TB with high-cardinality keys (URLs, n-grams,
  * user ids) the shuffle is the size of the key universe. This operator
  * runs the classic two-pass distributed heavy-hitter scheme instead:
  *
  *   1. **Misra-Gries candidate pass**: each partition summarizes its rows
  *      with k = ceil(slack/theta) counters (bounded memory, single
  *      sequential scan). Pigeonhole: any key with global frequency >=
  *      theta*N is local-heavy (freq_p >= theta*n_p) in at least one
  *      partition, and Misra-Gries with k >= 1/theta counters never drops
  *      a local-heavy key — so the candidate union has NO false
  *      negatives. Only candidate keys — at most k per partition —
  *      leave the executors.
  *   2. **Exact verification pass**: re-scan, keep candidate rows only
  *      (broadcast semi-join), count exactly, threshold at theta*N.
  *      False positives from pass 1 die here.
  *
  * The output is therefore EXACT and independent of partitioning — the
  * approximation affects only which extra candidates get counted, never
  * the answer — which is what makes it oracle-checkable row-for-row.
  * Cost: two scans, but the shuffle carries candidate keys only.
  *
  * Null keys are ignored (no-group semantics, like SQL aggregation keys).
  */
object HeavyHitters {

  def heavyHitters(df: DataFrame, keyCol: String, theta: Double,
                   slack: Int = 2): DataFrame = {
    require(theta > 0 && theta <= 1, s"theta must be in (0,1], got $theta")
    require(slack >= 1, s"slack must be >= 1, got $slack")
    val k = math.max(1, math.ceil(slack / theta).toInt)
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(keyCol).cast("string").as("k"))
      .filter(col("k").isNotNull)

    val candidates = keyed.as[String].mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long](k * 2)
      while (it.hasNext) {
        val x = it.next()
        val c = counters.getOrDefault(x, 0L)
        if (c > 0L) counters.put(x, c + 1L)
        else if (counters.size < k) counters.put(x, 1L)
        else {
          // decrement-all step: drop one occurrence of every tracked key
          // plus the new one (k+1 distinct keys cancel each other out)
          val itk = counters.entrySet().iterator()
          while (itk.hasNext) {
            val e = itk.next()
            if (e.getValue == 1L) itk.remove()
            else e.setValue(e.getValue - 1L)
          }
        }
      }
      counters.keySet().iterator().asScala
    }.toDF("k").distinct()

    keyed
      .join(broadcast(candidates), "k")
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(keyed.agg(count(lit(1)).as("n_total"))))
      .filter(col("cnt") >= col("n_total") * theta)
      .select(col("k").as(keyCol), col("cnt"),
        round(col("cnt") / col("n_total"), 6).as("frac"))
  }
}
