package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}

/** Int8 quantization: storage type, error bound, reconstruction quality,
  * and the zero-vector edge case.
  */
class VectorOpsSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val emb = spark.read.parquet(sfDir("0.001") + "/embeddings.parquet")

  test("quantized column is array<tinyint> with codes in [-127, 127]") {
    val q = VectorOps.quantizeWithError(emb, "vec_id", "embedding")
    assert(q.schema("q_emb").dataType == ArrayType(ByteType, containsNull = false) ||
      q.schema("q_emb").dataType == ArrayType(ByteType, containsNull = true))
    val bounds = q.select(
      expr("aggregate(q_emb, CAST(127 AS TINYINT), (a, v) -> least(a, v))").as("lo"),
      expr("aggregate(q_emb, CAST(-127 AS TINYINT), (a, v) -> greatest(a, v))").as("hi"))
      .agg(min("lo"), max("hi")).head()
    assert(bounds.getByte(0) >= -127 && bounds.getByte(1) <= 127)
  }

  test("reconstruction error bounded by scale/2 and cosine stays near 1") {
    val q = VectorOps.quantizeWithError(emb, "vec_id", "embedding")
    val viol = q.filter(col("max_abs_err") > col("q_scale") * 0.5 + lit(1e-9)).count()
    assert(viol == 0, s"$viol vectors exceed the scale/2 error bound")
    val worst = q.agg(min("cosine_recon")).head().getDouble(0)
    // 64-dim unit vectors at 8-bit precision: reconstruction cosine ~1
    assert(worst > 0.999, s"worst reconstruction cosine $worst")
  }

  test("zero vector quantizes to zero codes with zero error") {
    val z = Seq((1L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val r = VectorOps.quantizeWithError(z, "vec_id", "embedding").head()
    assert(r.getAs[Seq[Byte]]("q_emb").forall(_ == 0))
    assert(r.getAs[Double]("max_abs_err") == 0.0)
  }

  test("quantization is a pure row-local map: no exchange in the plan") {
    val plan = VectorOps.quantizeWithError(emb, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
