package graft.operators

import graft.SparkTestBase

/** [[RankingEval.evalRun]] against hand-folded metric values. */
class RankingEvalSpec extends SparkTestBase {

  import spark.implicits._

  private def round6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  // the operator's per-rank gain as the exact DECIMAL(28,9) it becomes:
  // round the double to 9 dp, keep it as a BigDecimal for exact summation
  private def gain(r: Int): BigDecimal =
    BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("recall/MRR/nDCG match a hand-folded example; empty and missing queries score zero") {
    // qid 1: rel {10,11,12}; run hits 10@1, 11@4 inside k=5, 12@20 outside
    // qid 2: rel {20}; run has only misses
    // qid 3: rel {30}; absent from the run entirely
    val qrels = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (3L, 30L))
      .toDF("qid", "doc")
    val run = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 98L, 3), (1L, 11L, 4), (1L, 12L, 20),
      (2L, 30L, 1), (2L, 31L, 2))
      .toDF("qid", "doc", "r")
    val out = RankingEval.evalRun(run, qrels, "qid", "doc", "r", k = 5)
      .orderBy("qid")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // accumulate gains in BigDecimal exactly as the operator's DECIMAL sum
    val idcg1 = (gain(1) + gain(2) + gain(3)).toDouble // ideal_m = min(3, 5)
    val dcg1 = (gain(1) + gain(4)).toDouble
    assert(out(0) == ((1L, round6(2.0 / 3), 1.0, round6(dcg1 / idcg1))))
    assert(out(1) == ((2L, 0.0, 0.0, 0.0)))
    assert(out(2) == ((3L, 0.0, 0.0, 0.0)))
  }

  test("a perfect run scores 1.0 on every metric") {
    val qrels = Seq((1L, 10L), (1L, 11L)).toDF("qid", "doc")
    val run = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "doc", "r")
    val out = RankingEval.evalRun(run, qrels, "qid", "doc", "r", k = 10)
      .head()
    assert((out.getDouble(1), out.getDouble(2), out.getDouble(3)) == ((1.0, 1.0, 1.0)))
  }
}
