package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent character-bigram array of a string in one pass — the hot
  * row-local step of the char-bigram LM family (q93/q107/q217/q237/…,
  * [[graft.ext.TextAnalysis.charBigrams]]).
  *
  * The composable form — `zip_with(slice(split(c, ''), 1, n−1),
  * slice(split(c, ''), 2, n−1), concat)` — pays a regex split into n
  * single-character strings plus two slice copies plus a boxed lambda
  * concat per element (four array allocations and ~3n string
  * allocations per document). This expression walks the UTF-8 byte
  * buffer once and slices each bigram directly out of it (n−1 string
  * allocations, zero intermediate arrays).
  *
  * Semantics are bit-identical to the HOF form: Java's empty-pattern
  * regex split (what Spark's `split(c, "")` runs) advances by CODE
  * POINT, so "characters" are code points here too
  * ([[UTF8String.numBytesForFirstByte]] walks exactly those
  * boundaries), and each bigram is the byte-concatenation of two
  * adjacent code points — the same bytes `concat(a, b)` produces.
  * Strings with fewer than 2 code points yield the empty array, the
  * `when(length(c) >= 2, …).otherwise(array())` contract of the HOF
  * form. CharBigramsSpec pins the equivalence on ASCII, multi-byte,
  * empty and single-char inputs.
  */
case class CharBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"char_bigrams needs string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharBigrams.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharBigrams.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharBigrams =
    copy(child = newChild)
}

object CharBigrams {

  private val Empty = new GenericArrayData(new Array[Any](0))

  /** Static for codegen: adjacent code-point bigrams of `s`. */
  def compute(s: UTF8String): ArrayData = {
    val nBytes = s.numBytes()
    if (nBytes < 2) return Empty
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    // code-point start offsets (byte positions); at most nBytes + 1
    val starts = new Array[Int](nBytes + 1)
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      starts(nChars) = i
      nChars += 1
      i += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, offset + i))
    }
    starts(nChars) = nBytes
    if (nChars < 2) return Empty
    val out = new Array[Any](nChars - 1)
    var j = 0
    while (j < nChars - 1) {
      val from = starts(j)
      val len = starts(j + 2) - from
      val bytes = new Array[Byte](len)
      org.apache.spark.unsafe.Platform.copyMemory(base, offset + from, bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)
      out(j) = UTF8String.fromBytes(bytes)
      j += 1
    }
    new GenericArrayData(out)
  }

  def char_bigrams(c: Column): Column =
    ColumnBridge.column(CharBigrams(ColumnBridge.expression(c)))
}
