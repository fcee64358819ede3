package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sorted_long_intersect(a, b)`: the number of common elements of two
  * ASCENDING-sorted `array<bigint>` values, by a two-pointer merge scan —
  * zero allocation, O(|a| + |b|), whole-stage-codegen'd.
  *
  * This is the verification kernel of the Jaccard dedup paths: shingle
  * sets travel as sorted 64-bit token hashes instead of string arrays, so
  * the per-pair intersection needs no hash set, no string hashing, and no
  * per-row garbage — `array_intersect` over string arrays builds a hash
  * map of the build side PER ROW, which at 100k+ candidate pairs per
  * partition turns verification into a GC workload (measured: the q_d6
  * verify stage spent 50-67 s in GC at sf0.1 before the switch).
  *
  * Contract: both inputs sorted ascending (signed long order — what
  * `sort_array` produces). Unsorted input silently undercounts; callers
  * own the sort, paid once per corpus, not per pair. Duplicate elements
  * count min(multiplicity) times, matching set semantics for the distinct
  * sets the dedup paths produce. Null array → null; null ELEMENTS are not
  * expected (token hashes are never null) and are skipped by the merge.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_long_intersect expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "sorted_long_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) { i += 1 }
      else if (y.isNullAt(j)) { j += 1 }
      else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else { c += 1; i += 1; j += 1 }
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    final long $xv = $a.getLong($i);
         |    final long $yv = $b.getLong($j);
         |    if ($xv < $yv) { $i++; }
         |    else if ($xv > $yv) { $j++; }
         |    else { $c++; $i++; $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}
