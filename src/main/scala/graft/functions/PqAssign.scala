package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization code assignment as custom Catalyst
  * expressions (SURVEY.md §4 preference (b)) — the PQ hot path.
  *
  * The composable form ([[graft.ext.Similarity]] round 11) evaluated,
  * PER ROW, k `aggregate(zip_with(s, codewordLiteral, …))` calls per
  * subspace — m·k interpreted higher-order-function folds with boxed
  * lambda frames and a fresh intermediate array each (m=4, k=16 → 64
  * HOF evaluations per vector). Spark does not codegen HOF lambdas,
  * so this dominated `pqFit`/`pqEncode`, and the fit dominates every
  * PQ bench number (BENCH_NOTES round 12: 70-85% of q143/q145/q156).
  * These expressions run the identical arithmetic as one tight
  * primitive loop over a reference-carried codebook matrix.
  *
  * Bit-identity contract (what lets the shipped oracles stay
  * byte-shared): the squared-distance fold is ascending-component
  * sequential — `acc += (a−b)·(a−b)` from component 0 — exactly the
  * HOF form's `aggregate(zip_with(...))` order, and the argmin
  * tie-break is first-position-of-max over the NEGATED distances
  * (lowest code index), compared with `java.lang.Double.compare` —
  * `array_max`'s ordering. PqSpec proves expression ≡ HOF form
  * equality on fixture embeddings.
  */
object PqAssign {

  private[functions] def checkSub(t: DataType): TypeCheckResult = t match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"pq_assign needs array<double>, got $other")
  }

  /** Code (argmin squared distance, lowest-index tie-break) of one
    * subvector against subspace `j`'s codewords. Static for codegen.
    */
  def computeSub(s: ArrayData, j: Int, cb: Array[Array[Array[Double]]]): Int = {
    require(j >= 0 && j < cb.length,
      s"pq_assign subspace index $j out of range 0..${cb.length - 1}")
    val words = cb(j)
    val n = s.numElements()
    // loud failure, the computeAll stance: a subvector whose length
    // differs from the codeword length would otherwise be silently
    // truncated by the distance fold and assigned a wrong code
    if (n != words(0).length) throw new IllegalArgumentException(
      s"pq_assign subvector length $n != codeword length ${words(0).length} " +
        s"in subspace $j")
    val v = new Array[Double](n)
    var d = 0
    while (d < n) {
      if (s.isNullAt(d)) throw new IllegalArgumentException(
        s"pq_assign: null vector component at $d")
      v(d) = s.getDouble(d); d += 1
    }
    var bestIdx = 0
    var bestNeg = -dist(v, words(0))
    var c = 1
    while (c < words.length) {
      val neg = -dist(v, words(c))
      // array_max ordering: strictly-greater keeps the FIRST max
      if (java.lang.Double.compare(neg, bestNeg) > 0) { bestNeg = neg; bestIdx = c }
      c += 1
    }
    bestIdx
  }

  /** All m codes of a full vector: slice per subspace (dim/m
    * components each, ascending), argmin per slice. Static for
    * codegen. Dimension must divide evenly — mismatches throw, the
    * [[DotProduct.compute]] loud-failure stance.
    */
  def computeAll(nv: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val sub = cb(0)(0).length
    val dim = nv.numElements()
    if (dim != m * sub) throw new IllegalArgumentException(
      s"pq_assign dimension mismatch: vector dim $dim vs $m subspaces × $sub components")
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      val words = cb(j)
      var bestIdx = 0
      var bestNeg = -distAt(nv, base, words(0))
      var c = 1
      while (c < words.length) {
        val neg = -distAt(nv, base, words(c))
        if (java.lang.Double.compare(neg, bestNeg) > 0) { bestNeg = neg; bestIdx = c }
        c += 1
      }
      codes(j) = bestIdx
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Ascending-index sequential fold — the HOF `aggregate(zip_with)`
    * order, bit-for-bit.
    */
  private def dist(v: Array[Double], w: Array[Double]): Double = {
    val n = math.min(v.length, w.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val diff = v(i) - w(i)
      acc += diff * diff
      i += 1
    }
    acc
  }

  private def distAt(nv: ArrayData, base: Int, w: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < w.length) {
      if (nv.isNullAt(base + i)) throw new IllegalArgumentException(
        s"pq_assign: null vector component at ${base + i}")
      val diff = nv.getDouble(base + i) - w(i)
      acc += diff * diff
      i += 1
    }
    acc
  }

  def pq_assign_sub(s: Column, j: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAssignSub(
      ColumnBridge.expression(s), ColumnBridge.expression(j), codebooks))

  def pq_assign_all(nv: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAssignAll(ColumnBridge.expression(nv), codebooks))
}

/** `(subvector, subspaceIdx) → code` — the [[graft.ext.Similarity]]
  * `pqFit` shape, where subvectors ride an exploded `(id, j, s)`
  * table.
  */
case class PqAssignSub(left: Expression, right: Expression,
                       codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (PqAssign.checkSub(left.dataType), right.dataType) match {
      case (TypeCheckResult.TypeCheckSuccess, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (TypeCheckResult.TypeCheckSuccess, other) =>
        TypeCheckResult.TypeCheckFailure(s"pq_assign_sub subspace index must be int, got $other")
      case (fail, _) => fail
    }

  override protected def nullSafeEval(s: Any, j: Any): Any =
    PqAssign.computeSub(s.asInstanceOf[ArrayData], j.asInstanceOf[Int], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, (s, j) => s"graft.functions.PqAssign.computeSub($s, $j, $cbRef)")
  }

  // content-based equality: the synthesized case-class equals compares
  // the codebook Array by REFERENCE, which defeats Catalyst CSE and
  // CacheManager plan-matching across query builds (the q46/r14
  // lesson; see LexiconIndex).
  override def equals(o: Any): Boolean = o match {
    case that: PqAssignSub => left == that.left && right == that.right &&
      java.util.Arrays.deepEquals(codebooks.asInstanceOf[Array[AnyRef]],
        that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    (left.hashCode * 31 + right.hashCode) * 31 +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAssignSub =
    copy(left = newLeft, right = newRight)
}

/** `vector → array<int>` of all m codes — the `pqEncode` shape. */
case class PqAssignAll(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = PqAssign.checkSub(child.dataType)

  override protected def nullSafeEval(nv: Any): Any =
    PqAssign.computeAll(nv.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, nv => s"graft.functions.PqAssign.computeAll($nv, $cbRef)")
  }

  // content-based equality (see PqAssignSub)
  override def equals(o: Any): Boolean = o match {
    case that: PqAssignAll => child == that.child &&
      java.util.Arrays.deepEquals(codebooks.asInstanceOf[Array[AnyRef]],
        that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    child.hashCode * 31 +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): PqAssignAll =
    copy(child = newChild)
}
