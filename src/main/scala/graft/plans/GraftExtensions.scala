package graft.plans

import graft.functions.{CosineSimilarity, MinHashSignatureExpr, SimHash60Expr, SortedLongIntersectCount, SrpBucketKeysExpr}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native expressions as SQL
  * functions. Install at session build time with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`, or on a
  * live session with `GraftExtensions.register(spark)` (idempotent).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectPlannerStrategy(_ => FulfillmentStrategy)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e.eval() match {
    case n: Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
        CosineSimilarity(args.head, args.last)
      }),
    (FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60Expr].getName, "simhash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          s"simhash60 expects (tokens[, family]), got ${args.length} arguments")
        val family =
          if (args.length == 1) graft.functions.HashFamily.Md5
          else args(1).eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String =>
              graft.functions.HashFamily.validate(s.toString)
            case other => throw new IllegalArgumentException(
              s"simhash60 family must be a string literal, got $other")
          }
        SimHash60Expr(args.head, family)
      }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"minhash_sig expects 2 arguments, got ${args.length}")
        MinHashSignatureExpr(args.head, intArg(args(1), "minhash_sig"))
      }),
    (FunctionIdentifier("srp_buckets"),
      new ExpressionInfo(classOf[SrpBucketKeysExpr].getName, "srp_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 4, s"srp_buckets expects 4 arguments, got ${args.length}")
        SrpBucketKeysExpr(args.head, intArg(args(1), "srp_buckets"),
          intArg(args(2), "srp_buckets"), intArg(args(3), "srp_buckets").toLong)
      }),
    (FunctionIdentifier("sorted_long_intersect"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName, "sorted_long_intersect"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"sorted_long_intersect expects 2 arguments, got ${args.length}")
        SortedLongIntersectCount(args.head, args.last)
      }))

  /** Register on a live session (no-op if already present). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  /** Register the custom planner strategy on a live session (idempotent). */
  def registerStrategy(spark: SparkSession): Unit = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!ss.experimental.extraStrategies.contains(FulfillmentStrategy))
      ss.experimental.extraStrategies =
        ss.experimental.extraStrategies :+ FulfillmentStrategy
  }
}
