package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-LM ENCODE kernel (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram model), the [[BpeCodec]] discipline applied to
  * Viterbi segmentation: the piece table and its integer scores ride as
  * DATA in one serialized object, ONE expression node whatever the
  * vocabulary size, and the per-word dynamic program runs inside
  * whole-stage codegen through a single virtual call.
  *
  * == Integer likelihoods (the oracle contract) ==
  *
  * True unigram scoring is `Σ log p(piece)`; floating-point logs do not
  * replay bit-for-bit across engines (Java's `ln`-ratio log2 returns
  * 2.9999999999999996 for 8), so scores are the PIECEWISE-LINEAR log2,
  * 1000-scaled, in pure integer arithmetic:
  *
  *   `ilog(x) = 1000·f + (1000·(x − 2^f)) / 2^f`,  f = floor(log2 x)
  *              (f via bit length; the division floors — positive terms)
  *
  * A piece with count c scores `L = ilog(c + 1)` (+1: zero-usage single
  * chars must stay finite); the corpus normalizer is `LT = ilog(T)`,
  * `T = Σ(c + 1)`. Viterbi maximizes `Σ (L(piece) − LT)` — the exact
  * integer image of maximizing Σ log p — with a strict total order on
  * ties: fewer pieces, then the LONGEST last piece, recursively (the
  * leftmost-longest convention). Both engines replay the same integers;
  * the DuckDB oracle computes f with `floor(log2(x))`, exact at and
  * around powers of two for x < 2^40.
  */
final class UnigramCodec(val pieces: Array[String], val counts: Array[Long],
                         val maxLen: Int) extends Serializable {
  require(pieces.length == counts.length,
    s"piece/count sides differ: ${pieces.length} vs ${counts.length}")
  require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
  require(counts.forall(_ >= 0L), "negative piece count")

  /** ilog(x): 1000-scaled piecewise-linear floor-log2 of a POSITIVE x. */
  def ilog(x: Long): Long = {
    require(x > 0, s"ilog of non-positive $x")
    val f = 63 - java.lang.Long.numberOfLeadingZeros(x)
    1000L * f + (1000L * (x - (1L << f))) / (1L << f)
  }

  val logTotal: Long = ilog(counts.map(_ + 1L).sum)

  @transient private lazy val scoreOf: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Long.valueOf(ilog(counts(i) + 1L)))
      i += 1
    }
    m
  }

  /** Viterbi over the word's CODE POINTS (matching SQL `substr`
    * semantics for BMP text): returns the chosen piece length at each
    * end position, or null for the empty word. Tie order: max score,
    * then min piece count, then max last-piece length. */
  private def viterbi(cps: Array[String]): (Array[Int], Array[Int]) = {
    val n = cps.length
    val sc = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    val ch = new Array[Int](n + 1) // chosen last-piece length at j
    var j = 1
    while (j <= n) {
      var bestSc = Long.MinValue
      var bestNp = Int.MaxValue
      var bestK = 0
      var k = 1
      val kMax = math.min(maxLen, j)
      while (k <= kMax) {
        val sb = new java.lang.StringBuilder()
        var p = j - k
        while (p < j) { sb.append(cps(p)); p += 1 }
        val l = scoreOf.get(sb.toString)
        if (l != null) {
          val cSc = sc(j - k) + l.longValue() - logTotal
          val cNp = np(j - k) + 1
          if (cSc > bestSc || (cSc == bestSc && (cNp < bestNp ||
              (cNp == bestNp && k > bestK)))) {
            bestSc = cSc; bestNp = cNp; bestK = k
          }
        }
        k += 1
      }
      require(bestK > 0,
        s"no piece covers position $j of '${cps.mkString}' — the vocabulary " +
          "must contain every single character of the corpus")
      sc(j) = bestSc; np(j) = bestNp; ch(j) = bestK
      j += 1
    }
    (np, ch)
  }

  private def codePointsOf(word: String): Array[String] = {
    val cps = word.codePoints().toArray
    val a = new Array[String](cps.length)
    var i = 0
    while (i < cps.length) { a(i) = new String(Character.toChars(cps(i))); i += 1 }
    a
  }

  /** Token count of one word (0 for the empty string). */
  def countTokens(word: String): Int = {
    val cps = codePointsOf(word)
    if (cps.isEmpty) 0 else viterbi(cps)._1(cps.length)
  }

  /** The segmentation itself — backtraced pieces in order. */
  def tokens(word: String): Array[String] = {
    val cps = codePointsOf(word)
    if (cps.isEmpty) return Array.empty
    val ch = viterbi(cps)._2
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = cps.length
    while (j > 0) {
      val k = ch(j)
      val sb = new java.lang.StringBuilder()
      var p = j - k
      while (p < j) { sb.append(cps(p)); p += 1 }
      out += sb.toString
      j -= k
    }
    out.reverseIterator.toArray
  }

  /** [[tokens]] as catalyst ArrayData of UTF8Strings — the codegen entry
    * (the BpeCodec.tokensOf shape). */
  def tokensUtf8(word: UTF8String): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      tokens(word.toString).map(UTF8String.fromString).asInstanceOf[Array[Any]])

  /** `Σ countTokens(word)` over an array<string> of words. */
  def countDocTokens(words: ArrayData): Long = {
    var total = 0L
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) total += countTokens(words.getUTF8String(i).toString)
      i += 1
    }
    total
  }

  override def equals(other: Any): Boolean = other match {
    case o: UnigramCodec =>
      maxLen == o.maxLen &&
        java.util.Arrays.equals(pieces.asInstanceOf[Array[AnyRef]],
          o.pieces.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(counts, o.counts)
    case _ => false
  }
  override def hashCode(): Int =
    (31 * java.util.Arrays.hashCode(pieces.asInstanceOf[Array[AnyRef]]) +
      java.util.Arrays.hashCode(counts)) * 31 + maxLen
}

object UnigramExprs {
  import org.apache.spark.sql.graft.{GraftDatasetBridge => Bridge}

  /** `n_tokens` of a word-array column under `codec` — one codegen'd
    * expression node; the piece table never appears in the plan. */
  def docTokenCount(words: Column, codec: UnigramCodec): Column =
    Bridge.column(UnigramDocTokenCount(Bridge.expression(words), codec))

  /** Viterbi piece array of a single-word string column under `codec`. */
  def encodeTokens(word: Column, codec: UnigramCodec): Column =
    Bridge.column(UnigramEncodeTokens(Bridge.expression(word), codec))
}

/** `tokens(word)` of a string column → array<string> (the Viterbi
  * segmentation itself, in order). */
case class UnigramEncodeTokens(child: Expression, codec: UnigramCodec)
    extends UnaryExpression {
  override def prettyName: String = "unigram_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(word: Any): Any =
    codec.tokensUtf8(word.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramCodec", codec, classOf[UnigramCodec].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokensUtf8($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `SUM(viterbi token count(word))` over an `array<string>` → long. */
case class UnigramDocTokenCount(child: Expression, codec: UnigramCodec)
    extends UnaryExpression {
  override def prettyName: String = "unigram_doc_token_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override protected def nullSafeEval(words: Any): Any =
    codec.countDocTokens(words.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramCodec", codec, classOf[UnigramCodec].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countDocTokens($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
