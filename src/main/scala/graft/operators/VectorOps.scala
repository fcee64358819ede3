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
