package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** ⊕ Content-defined-chunking cut positions (the
  * [[graft.ext.Chunker.contentChunks]] hot loop as a codegen
  * expression): emit every 1-based codepoint position `p ∈ [window,
  * len]` where the polynomial hash of the trailing `window`-codepoint
  * context ≡ 0 (mod `divisor`).
  *
  * The hash is IDENTICAL to the HOF/oracle form — `Σ c_j·256^(w−j)
  * mod modulus` over the window — but computed with a true O(1)
  * rolling update per position (`h' = h·256 + c_in − c_out·256^w mod
  * m`) instead of the HOF's O(window) re-fold, and in one tight
  * codegen'd loop instead of per-element lambda interpretation: same
  * cut set, ~w× less arithmetic and no HOF overhead (the
  * DotProduct/SimHash64 precedent — Catalyst lambda evaluation is
  * hostile to per-element inner loops). ChunkerSpec proves cut-set
  * equality against the HOF form on the fixture corpus.
  *
  * Codepoint semantics match both engines' `substr`/`ascii`
  * (UTF8String substring and DuckDB substr both index codepoints).
  * Texts shorter than `window` (or empty) yield an empty array; null
  * in → null out.
  */
case class CdcCuts(child: Expression, window: Int, modulus: Long, divisor: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"cdc_cuts needs string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    CdcCuts.compute(input.toString, window, modulus, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.CdcCuts.compute(
         |  $c.toString(), $window, ${modulus}L, ${divisor}L);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {

  /** Shared by expression and tests; never null. */
  def compute(text: String, window: Int, modulus: Long, divisor: Long): ArrayData = {
    // codepoint array (matches substr/ascii indexing in both engines)
    val n = text.codePointCount(0, text.length)
    if (n < window) return new GenericArrayData(Array.emptyLongArray)
    val codes = new Array[Long](n)
    var ci = 0
    var off = 0
    while (off < text.length) {
      val cp = text.codePointAt(off)
      codes(ci) = cp.toLong
      ci += 1
      off += Character.charCount(cp)
    }
    // 256^window mod m for the rolling eviction term
    var bw = 1L
    var e = 0
    while (e < window) { bw = (bw * 256L) % modulus; e += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Long](n / 32 + 4)
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 256L + codes(i)) % modulus
      if (i >= window) {
        h = (h - (codes(i - window) * bw) % modulus + modulus) % modulus
      }
      if (i >= window - 1 && h % divisor == 0) out += (i + 1).toLong
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def cdcCuts(text: Column, window: Int = 16, modulus: Long = 1000003L,
              divisor: Long = 64L): Column =
    ColumnBridge.column(CdcCuts(ColumnBridge.expression(text), window, modulus, divisor))
}
