package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Banded Levenshtein predicate kernel: is edit_distance(a, b) <= k?
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|*|b|) DP table and then
  * throws away everything but the threshold test. For the thresholded
  * question only the diagonal band of width 2k+1 can matter (any cell
  * farther than k from the diagonal is already > k), so the banded DP
  * costs O(k*min(|a|,|b|)) — and the scan BAILS as soon as the band's
  * minimum exceeds k, which for non-matching pairs (the overwhelming
  * majority inside a fuzzy-join block) is usually after 2-3 rows. At k=1
  * that is ~n/2 cells against the full DP's n^2.
  *
  * Char-level (= code-point for BMP text; supplementary-plane pairs count
  * per surrogate half, like java.lang.String indexing). Fuzzy-join
  * blocking keys are ASCII in every oracle we compare against, where
  * char, code-point and byte distances coincide.
  */
object EditDistance {

  /** True iff levenshtein(a, b) <= k. */
  def within(ua: UTF8String, ub: UTF8String, k: Int): Boolean = {
    val a = ua.toString
    val b = ub.toString
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    val m = t.length
    if (m - n > k) return false
    if (k <= 0) return m - n <= 0 && s == t
    val inf = Int.MaxValue / 2
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    val j0 = math.min(n, k)
    while (j <= j0) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= m) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - k)
      val hi = math.min(n, i + k)
      cur(0) = if (i <= k) i else inf
      var best = cur(0)
      var jj = lo
      while (jj <= hi) {
        val cost = if (t.charAt(i - 1) == s.charAt(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = cur(jj - 1) + 1
        if (ins < v) v = ins
        cur(jj) = v
        if (v < best) best = v
        jj += 1
      }
      // the DP values are non-decreasing down the band: once every cell of
      // a row exceeds k, no suffix can bring the distance back under it
      if (best > k) return false
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    prev(n) <= k
  }
}

/** `lev_within(a, b, k)`: banded thresholded edit distance (see
  * [[EditDistance.within]]), whole-stage-codegen'd via a static kernel
  * call — the verification predicate of the blocked fuzzy join.
  */
case class LevenshteinWithin(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 0, s"lev_within threshold must be >= 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType.isInstanceOf[StringType])
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lev_within expects (string, string, int literal), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "lev_within"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EditDistance.within(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EditDistance.within($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
