package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** ⊕ SimHash document fingerprint (north-star near-dup operator;
  * Charikar 2002, "Similarity estimation techniques from rounding
  * algorithms"): 64-bit signature whose Hamming distance approximates
  * the cosine distance of the token multiset.
  *
  * Custom Catalyst `Expression` (SURVEY.md §4 preference (b)): takes
  * `ArrayType(StringType)` tokens → `LongType` signature. Token hash is
  * FNV-1a 64 (public-domain constant set) — deterministic across
  * engines and sessions, unlike `Murmur3Hash` seeded per-plan.
  *
  * Codegen: emits a call to the static [[SimHash64.compute]] helper, so
  * the expression participates in whole-stage codegen (no
  * CodegenFallback iterator break).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime  = 0x100000001b3L

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Static so generated code can call it directly. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) r |= (1L << b)
      b += 1
    }
    r
  }

  /** Column-API entry point. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
