package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression for corpus storage: symmetric per-vector int8
  * quantization. At 100 TB an `array<float>` embedding column is the
  * dominant storage (and scan-bytes) line item; int8 cuts it 4x with a
  * bounded reconstruction error (<= scale/2 per component, scale =
  * max|x|/127), which downstream ANN re-ranking absorbs by re-scoring the
  * short candidate list against the full-precision source of truth.
  *
  * Everything is row-local codegen'd collection expressions — quantization
  * is a map over the corpus with no shuffle, and the arithmetic (floor(x /
  * scale + 0.5), round-half-up) is chosen to be bit-replayable by external
  * engines so the driver oracle can recompute it.
  */
object VectorOps {

  /** Per-vector symmetric scale: max|x| / 127, floored at 1e-12 so the
    * all-zero vector quantizes to zeros instead of dividing by zero.
    */
  def quantScale(embCol: String): Column = expr(
    s"greatest(aggregate($embCol, CAST(0 AS DOUBLE), " +
      s"(a, x) -> greatest(a, abs(CAST(x AS DOUBLE)))) / 127.0D, 1e-12D)")

  /** `array<tinyint>` quantized form: round-half-up of x/scale, clamped to
    * [-127, 127] (the symmetric range; -128 is never produced, so the
    * codes negate safely). `scaleCol` must be [[quantScale]] of the same
    * vector.
    */
  def quantizeInt8(embCol: String, scaleCol: String): Column = expr(
    s"transform($embCol, x -> CAST(greatest(least(" +
      s"floor(CAST(x AS DOUBLE) / $scaleCol + 0.5D), 127.0D), -127.0D) AS TINYINT))")

  /** Dequantized `array<double>`: code * scale. */
  def dequantize(qCol: String, scaleCol: String): Column = expr(
    s"transform($qCol, v -> CAST(v AS DOUBLE) * $scaleCol)")

  /** The storable quantized corpus: (idCol, q_scale, q_emb). At scale this
    * is materialized at ingest and the float column never enters the search
    * scan — int8 codes are the phase-1 working set (4x fewer scan bytes,
    * and the per-vector scale CANCELS out of cosine, so phase-1 scoring is
    * a pure integer-code dot product).
    */
  def quantizedTable(emb: DataFrame, idCol: String, embCol: String): DataFrame =
    emb
      .withColumn("q_scale", quantScale(embCol))
      .select(col(idCol), col("q_scale"), quantizeInt8(embCol, "q_scale").as("q_emb"))

  /** Two-phase ANN top-k: approximate scoring over the QUANTIZED corpus
    * (scan reads int8 codes only; score = dot(codes, query) / (|codes| x
    * |query|) — q_scale cancels), take the top `k * margin` candidates,
    * then rerank that short list against the full-precision table with
    * exact cosine. Returns (idCol, cosine) — identical to brute force
    * whenever the true top-k survive the approximate cut, which `margin`
    * buys: the approximate score deviates from the true cosine by at most
    * ~(1 - cosine_recon) ~ 1e-3 at 8-bit/64-dim, far below the candidate
    * gap at margin 8. Phase 1 is a scan + TakeOrdered over the small
    * quantized table; phase 2 joins `k * margin` ids (broadcast) back to
    * full precision — the float column is read for the candidate list
    * only.
    */
  def quantizedTopK(full: DataFrame, quantized: DataFrame, idCol: String,
                    embCol: String, query: Array[Float], k: Int,
                    margin: Int = 8): DataFrame = {
    val q = typedLit(query.toSeq)
    val cands = quantized
      .withColumn("q_vec", q)
      .withColumn("approx_cos", expr(
        "aggregate(zip_with(q_emb, q_vec, (c, y) -> CAST(c AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (a, v) -> a + v)" +
          " / greatest(sqrt(aggregate(q_emb, CAST(0 AS DOUBLE), (a, c) -> a + CAST(c AS DOUBLE) * CAST(c AS DOUBLE))) * " +
          "sqrt(aggregate(q_vec, CAST(0 AS DOUBLE), (a, y) -> a + CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), 1e-12D)"))
      .orderBy(col("approx_cos").desc, col(idCol))
      .limit(k * margin)
      .select(col(idCol))
    val dot = s"aggregate(zip_with($embCol, q_vec, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (a, v) -> a + v)"
    val n1 = s"sqrt(aggregate($embCol, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    val n2 = "sqrt(aggregate(q_vec, CAST(0 AS DOUBLE), (a, y) -> a + CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))"
    full
      .join(broadcast(cands), idCol)
      .withColumn("q_vec", q)
      .selectExpr(idCol, s"round($dot / ($n1 * $n2), 6) AS cosine")
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** (id, q_scale, q_emb) + reconstruction diagnostics per vector:
    * `max_abs_err` (worst component error — bounded by q_scale/2 up to
    * clamping) and `cosine_recon` (cosine between the original and its
    * dequantized reconstruction).
    */
  def quantizeWithError(emb: DataFrame, idCol: String, embCol: String): DataFrame = {
    val dot =
      s"aggregate(zip_with($embCol, _deq, (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (a, v) -> a + v)"
    val n1 = s"sqrt(aggregate($embCol, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    val n2 = "sqrt(aggregate(_deq, CAST(0 AS DOUBLE), (a, x) -> a + x * x))"
    emb
      .withColumn("q_scale", quantScale(embCol))
      .withColumn("q_emb", quantizeInt8(embCol, "q_scale"))
      .withColumn("_deq", dequantize("q_emb", "q_scale"))
      .withColumn("max_abs_err", expr(
        s"aggregate(zip_with($embCol, _deq, (x, y) -> abs(CAST(x AS DOUBLE) - y)), " +
          "CAST(0 AS DOUBLE), (a, v) -> greatest(a, v))"))
      .withColumn("cosine_recon", expr(s"$dot / greatest($n1 * $n2, 1e-12D)"))
      .drop("_deq")
  }
}
