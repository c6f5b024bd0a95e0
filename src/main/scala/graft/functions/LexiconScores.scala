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

  /** `array<string> → string`: the classify argmax fused INTO the
    * expression — label of the first lexicon (constructor order)
    * achieving the maximum hit count, or `fallback` when no lexicon
    * hits at all. Null tokens input → null (callers preserve the old
    * fold's null→fallback behavior with one `coalesce`).
    *
    * Round-14 lesson (the q46 regression, judge-bisected): composing
    * `lexicon_scores` with a k-way `greatest`/`when` fold references
    * the scores subtree ~2k times, and codegen CSE does NOT reliably
    * collapse those references on every plan shape — at document
    * granularity (q46's filter+project gate) the scores pass ran
    * multiple times per row and the swap lost >2× vs the old HOF
    * form. Fusing the argmax makes single evaluation a structural
    * guarantee instead of an optimizer outcome.
    */
  def lexicon_best(toks: Column, lexicons: Seq[(String, Seq[String])],
                   fallback: String): Column =
    ColumnBridge.column(LexiconBestExpr(ColumnBridge.expression(toks),
      new LexiconLabeler(lexicons.map(_._2.toArray).toArray,
        lexicons.map(_._1).toArray, fallback)))
}

/** Driver-built hashed lexicon sets (terms lowercased at build).
  *
  * Content-based equality (round-14 lesson, the q46 cache-miss root
  * cause): every driver-built reference object carried by a Catalyst
  * expression MUST equal by CONTENT, because Catalyst compares
  * expressions with case-class equality — a reference-identity
  * object makes two builds of the same query unequal, which silently
  * defeats codegen subexpression elimination (the scores subtree ran
  * 4× per row in q46's plan) AND CacheManager plan matching (the
  * curation pipeline's persisted survivor set cache-missed on every
  * bench iteration). Same rule applied to [[LexiconLabeler]],
  * [[CentroidIndex]], [[DictAutomaton]], and the raw codebook arrays
  * in PqAssign/SdcSum.
  */
final class LexiconIndex(val lexicons: Array[Array[String]]) extends Serializable {
  require(lexicons.nonEmpty, "lexicon_scores needs at least one lexicon")

  override def equals(o: Any): Boolean = o match {
    case that: LexiconIndex =>
      java.util.Arrays.deepEquals(
        lexicons.asInstanceOf[Array[AnyRef]], that.lexicons.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.deepHashCode(lexicons.asInstanceOf[Array[AnyRef]])

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    lexicons.map { terms =>
      val s = new java.util.HashSet[UTF8String](terms.length * 2)
      terms.foreach(t => s.add(UTF8String.fromString(t.toLowerCase)))
      s
    }

  private[functions] def scoresRaw(toks: ArrayData): Array[Int] = {
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
    out
  }

  /** Static-shaped for codegen. */
  def scores(toks: ArrayData): ArrayData =
    new GenericArrayData(scoresRaw(toks))
}

/** [[LexiconIndex]] plus the label/fallback vocabulary for the fused
  * classify argmax ([[LexiconScores.lexicon_best]]): first-max wins in
  * constructor order (the deterministic tie-break the old
  * `greatest`+`when` fold implemented), fallback when every count is 0.
  */
final class LexiconLabeler(lexicons: Array[Array[String]],
                           val labels: Array[String], val fallback: String)
    extends Serializable {
  require(labels.length == lexicons.length)
  private val index = new LexiconIndex(lexicons)

  override def equals(o: Any): Boolean = o match {
    case that: LexiconLabeler =>
      index == that.index &&
        java.util.Arrays.equals(labels.asInstanceOf[Array[AnyRef]],
          that.labels.asInstanceOf[Array[AnyRef]]) &&
        fallback == that.fallback
    case _ => false
  }
  override def hashCode(): Int =
    (index.hashCode * 31 +
      java.util.Arrays.hashCode(labels.asInstanceOf[Array[AnyRef]])) * 31 +
      fallback.hashCode

  @transient private lazy val labelU: Array[UTF8String] =
    labels.map(UTF8String.fromString)
  @transient private lazy val fallbackU: UTF8String =
    UTF8String.fromString(fallback)

  /** Static-shaped for codegen: one scores pass + inline argmax. */
  def best(toks: ArrayData): UTF8String = {
    val sc = index.scoresRaw(toks)
    var bi = -1
    var bv = 0
    var i = 0
    while (i < sc.length) {
      if (sc(i) > bv) { bv = sc(i); bi = i }
      i += 1
    }
    if (bi < 0) fallbackU else labelU(bi)
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

/** `array<string> → string`: fused lexicon-classify argmax (see
  * [[LexiconScores.lexicon_best]]). One scores pass per row by
  * construction — the argmax never re-references the scores subtree.
  */
case class LexiconBestExpr(child: Expression, labeler: LexiconLabeler)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    LexiconScores.checkToks(child.dataType)

  override protected def nullSafeEval(toks: Any): Any =
    labeler.best(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lexiconLabeler", labeler,
      classOf[LexiconLabeler].getName)
    defineCodeGen(ctx, ev, toks => s"$ref.best($toks)")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconBestExpr =
    copy(child = newChild)
}
