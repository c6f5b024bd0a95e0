package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as custom Catalyst expressions
  * (SURVEY.md §4 preference (b)) — the canonicalization stage a
  * multilingual corpus needs BEFORE any hash-keyed dedup: the same
  * visible text arrives both composed (é = U+00E9) and decomposed
  * (e + U+0301) from different scrapers, and every md5/MinHash/
  * fingerprint key in the pipeline would treat them as different
  * documents. `nfc_normalize` canonical-composes (Unicode NFC via
  * `java.text.Normalizer` — the same standard algorithm DuckDB's
  * utf8proc implements, so the oracle mirrors bit-for-bit);
  * `strip_accents` removes combining marks (NFD → drop `\p{Mn}` →
  * NFC), the aggressive fold used for accent-insensitive matching
  * (DuckDB's `strip_accents` agrees on Latin-script input — the
  * oracle plants its accents deterministically, so equivalence is
  * hash-checked, not assumed).
  *
  * Row-local, null-safe, streamable; both are single-pass over the
  * string with no regex in the hot path beyond the JDK normalizer's
  * table-driven transform.
  */
object UnicodeNorm {

  private[functions] def checkStr(t: DataType): TypeCheckResult = t match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode normalization needs string, got $other")
  }

  /** Static for codegen. */
  def computeNfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC))

  /** Static for codegen: NFD → strip combining marks → NFC. */
  def computeStrip(s: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (java.lang.Character.getType(cp) != java.lang.Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += java.lang.Character.charCount(cp)
    }
    UTF8String.fromString(java.text.Normalizer.normalize(sb.toString,
      java.text.Normalizer.Form.NFC))
  }

  def nfc_normalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  def strip_accents(c: Column): Column =
    ColumnBridge.column(StripAccents(ColumnBridge.expression(c)))
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    UnicodeNorm.checkStr(child.dataType)
  override protected def nullSafeEval(s: Any): Any =
    UnicodeNorm.computeNfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.UnicodeNorm.computeNfc($s)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    UnicodeNorm.checkStr(child.dataType)
  override protected def nullSafeEval(s: Any): Any =
    UnicodeNorm.computeStrip(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.UnicodeNorm.computeStrip($s)")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
