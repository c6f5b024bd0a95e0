package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** ⊕ Rolling-hash document fingerprints via winnowing (Schleimer,
  * Wilkerson & Aiken 2003, "Winnowing: Local Algorithms for Document
  * Fingerprinting" — the MOSS scheme):
  *
  *  1. Karp-Rabin rolling hash over every k-char gram of the
  *     normalized text (O(1) per shift: h' = (h - c₀·bᵏ⁻¹)·b + cₖ).
  *  2. In every window of w consecutive gram hashes, keep the minimum
  *     (rightmost on ties) — guarantees any match of length ≥ w+k-1
  *     shares a fingerprint, while storing ~2/(w+1) of the hashes.
  *
  * Output: sorted distinct array<long> of selected hashes. Shared
  * fingerprints between documents ≈ shared substrings — the
  * containment-robust dedup signal n-gram sets can't give (robust to
  * reordering large blocks, unlike a single content hash).
  *
  * Custom expression (no SQL-oracle form — rolling state is not
  * expressible in portable SQL); codegen'd via the static helper.
  */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"winnow needs string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    Winnow.compute(input.toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("fps")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $resultTerm =
         |  graft.functions.Winnow.compute($c.toString(), $k, $w);
         |if ($resultTerm == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $resultTerm;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  private val B = 1000003L          // hash base (prime)
  private val M = (1L << 61) - 1    // Mersenne prime modulus

  private def mulmod(a: Long, b: Long): Long = {
    // 61-bit Mersenne modular multiply via Math.multiplyHigh
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (x mod 2^61) + (x >> 61)
    val part = (lo & M) + ((hi << 3) | (lo >>> 61))
    val r = (part & M) + (part >>> 61)
    if (r >= M) r - M else r
  }

  /** Null for texts shorter than k. */
  def compute(text: String, k: Int, w: Int): ArrayData = {
    val n = text.length
    if (n < k) return null
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    // b^(k-1) mod M
    var bk = 1L
    for (_ <- 0 until k - 1) bk = mulmod(bk, B)
    var h = 0L
    var i = 0
    while (i < k) { h = (mulmod(h, B) + text.charAt(i)) % M; i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      h = (h + M - mulmod(text.charAt(i - 1), bk)) % M
      h = (mulmod(h, B) + text.charAt(i + k - 1)) % M
      hashes(i) = h
      i += 1
    }
    // winnow: sliding-window minimum (rightmost on ties) via a
    // monotonic deque — O(n), not O(n·w)
    val selected = new java.util.TreeSet[java.lang.Long]()
    val dq = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < nGrams) {
      while (!dq.isEmpty && hashes(dq.peekLast) >= hashes(i)) dq.pollLast()
      dq.addLast(i)
      if (dq.peekFirst <= i - w) dq.pollFirst()
      if (i >= w - 1) selected.add(hashes(dq.peekFirst))
      i += 1
    }
    if (selected.isEmpty) selected.add(hashes(dq.peekFirst))  // text shorter than one window
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(Winnow(ColumnBridge.expression(text), k, w))
}
