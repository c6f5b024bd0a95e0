package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-label lexicon hit counts as ONE codegen'd pass over a token
  * array (SURVEY.md §4 preference (b)) — the hot loop of
  * [[graft.ext.TextAnalysis.classifyByLexicon]]. The composable form
  * evaluated, per LABEL, a fresh `tokens(text)` split plus an
  * interpreted `filter(…, array_contains(lexLiteral, t))` HOF — k
  * labels → k regex splits and k boxed lambda passes per row, which
  * dominates chunk-level classification (q160/q166: tens of chunks
  * per document, each classified). This expression takes the token
  * array ONCE and counts every label's hits in a single loop with
  * hashed lexicon lookups.
  *
  * Bit-compat contract: counts occurrences WITH multiplicity —
  * exactly `size(filter(toks, t → array_contains(lex, t)))` — and
  * label order is the constructor's, so the downstream argmax/
  * tie-break fold is unchanged. Null tokens count for no label
  * (array_contains never matches null).
  */
object LexiconScores {

  private[functions] def checkToks(t: DataType): TypeCheckResult = t match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lexicon_scores needs array<string>, got $other")
  }

  def lexicon_scores(toks: Column, lexicons: Seq[Seq[String]]): Column =
    ColumnBridge.column(LexiconScoresExpr(ColumnBridge.expression(toks),
      new LexiconIndex(lexicons.map(_.toArray).toArray)))
}

/** Driver-built hashed lexicon sets (terms lowercased at build). */
final class LexiconIndex(val lexicons: Array[Array[String]]) extends Serializable {
  require(lexicons.nonEmpty, "lexicon_scores needs at least one lexicon")

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    lexicons.map { terms =>
      val s = new java.util.HashSet[UTF8String](terms.length * 2)
      terms.foreach(t => s.add(UTF8String.fromString(t.toLowerCase)))
      s
    }

  /** Static-shaped for codegen. */
  def scores(toks: ArrayData): ArrayData = {
    val ss = sets
    val out = new Array[Int](ss.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var l = 0
        while (l < ss.length) {
          if (ss(l).contains(t)) out(l) += 1
          l += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<string> → array<int>` of per-label hit counts. */
case class LexiconScoresExpr(child: Expression, index: LexiconIndex)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    LexiconScores.checkToks(child.dataType)

  override protected def nullSafeEval(toks: Any): Any =
    index.scores(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("lexiconIndex", index,
      classOf[LexiconIndex].getName)
    defineCodeGen(ctx, ev, toks => s"$idxRef.scores($toks)")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconScoresExpr =
    copy(child = newChild)
}
