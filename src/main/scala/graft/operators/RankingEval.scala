package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-evaluation metrics — the harness that closes the loop on the
  * engine's retrieval stack (BM25, brute/LSH/IVF/quantized ANN, RRF):
  * given a RUN (system ranking) and QRELS (relevant docs per query),
  * score recall@k, MRR@k and nDCG@k per query.
  *
  * Determinism contract (the oracle-hash discipline): every per-rank gain
  * `1/log2(rank+1)` is rounded to 9 dp and accumulated in DECIMAL — exact,
  * shuffle-order-independent addition — and the ideal DCG is an ORDERED
  * fold over `sequence(1, min(|qrels|, k))`, so any engine replaying the
  * arithmetic reproduces the metrics bit-for-bit.
  *
  * Scale shape: one equi-join of the top-k run slice against qrels on
  * (query, doc) — both frames are queries×k-sized, never corpus-sized —
  * then a query-keyed aggregation. Evaluation cost is independent of the
  * corpus; it depends only on the query set and k.
  */
object RankingEval {

  /** Per-query metrics for `run` (qidCol, docCol, rankCol with rank
    * starting at 1) against binary `qrels` (qidCol, docCol). Queries with
    * no relevant documents are dropped (metrics are undefined there);
    * queries whose run misses every relevant doc score 0.
    */
  def evalRun(run: DataFrame, qrels: DataFrame, qidCol: String,
              docCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val gain = s"CAST(round(1.0D / log2($rankCol + 1), 9) AS DECIMAL(28,9))"
    val hits = run.filter(col(rankCol) <= k)
      .join(qrels.select(col(qidCol), col(docCol)), Seq(qidCol, docCol))
      .groupBy(qidCol)
      .agg(count(lit(1)).as("n_hits"),
        min(col(rankCol)).as("first_hit"),
        sum(expr(gain)).as("dcg"))
    // the inner CAST keeps the fold type fixed (decimal addition widens
    // 28,9 + 28,9 -> 29,9, which the fold would reject); values are <= k,
    // far inside the precision
    val idcg = expr(
      s"aggregate(sequence(1, ideal_m), CAST(0 AS DECIMAL(28,9)), " +
        s"(acc, i) -> CAST(acc + CAST(round(1.0D / log2(i + 1), 9) AS DECIMAL(28,9)) AS DECIMAL(28,9)))")
    qrels.groupBy(qidCol).agg(count(lit(1)).as("n_rel"))
      .join(hits, Seq(qidCol), "left")
      .withColumn("ideal_m", least(col("n_rel"), lit(k)))
      .select(col(qidCol),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("ideal_m"), 6).as(s"recall_$k"),
        round(when(col("first_hit").isNull, 0.0)
          .otherwise(lit(1.0) / col("first_hit")), 6).as("mrr"),
        round(coalesce(col("dcg").cast("double"), lit(0.0)) /
          idcg.cast("double"), 6).as(s"ndcg_$k"))
  }
}
