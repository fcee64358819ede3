package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for i18n-correct dedup keys — Spark ships
  * neither NFC normalization nor accent stripping as builtins, so raw
  * `groupBy(text)` treats "café" (NFC) and "café" (NFD, e + combining
  * acute) as different documents and keeps both copies. Static kernels
  * over java.text.Normalizer, called from codegen (the EditDistance
  * pattern); both functions agree with DuckDB's `nfc_normalize` /
  * `strip_accents` on the Latin-script domain the oracles exercise.
  */
object UnicodeNorm {

  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** Decompose, drop combining marks, recompose: "mühléisen" → "muhleisen". */
  def stripAccents(s: UTF8String): UTF8String = {
    val decomposed = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val c = decomposed.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC))
  }
}

abstract class UnicodeNormExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.simpleString}")
  override def dataType: DataType = child.dataType
}

/** `nfc_normalize(s)`: canonical composition (NFC). */
case class NfcNormalize(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(s: Any): Any =
    UnicodeNorm.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `strip_accents(s)`: remove combining marks after decomposition. */
case class StripAccents(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "strip_accents"
  override protected def nullSafeEval(s: Any): Any =
    UnicodeNorm.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.stripAccents($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
