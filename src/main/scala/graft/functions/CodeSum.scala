package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The two PQ scoring folds as codegen expressions — the per-candidate
  * / per-pair inner loops of [[graft.ext.Similarity.ivfPqSearch]]
  * (asymmetric distance: `Σ_j lut(j)(codes(j))`) and
  * [[graft.ext.Similarity.semDedupPq]] (symmetric distance:
  * `Σ_j sdc(j)(ca(j))(cb(j))`). The composable form folded an
  * `aggregate(sequence(0, m−1), …)` of nested `element_at`s — an
  * interpreted HOF evaluated once per CANDIDATE (search) or per PAIR
  * (dedup), the exact row sets that grow with the corpus. Identical
  * arithmetic, ascending-subspace sequential fold starting at 0.0 —
  * bit-equal to the HOF form and the SQL oracles' `list_sum` mirror.
  *
  * Out-of-range or NULL codes/entries throw (the
  * [[DotProduct.compute]] loud-failure stance): `ArrayData.getInt`
  * reads a null slot as 0, which would silently score codeword 0 —
  * worse than the composable form's null propagation, so nulls are
  * rejected explicitly instead.
  */
object CodeSum {

  /** ADC: `lut` is the per-query m×k partial-dot table (a per-row
    * COLUMN — computed from the query vector in the plan), `codes`
    * the candidate's m codes. Static for codegen.
    */
  def adc(lut: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    if (lut.numElements() != m) throw new IllegalArgumentException(
      s"adc_sum subspace mismatch: lut has ${lut.numElements()}, codes $m")
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (lut.isNullAt(j) || codes.isNullAt(j)) throw new IllegalArgumentException(
        s"adc_sum: null lut row or code in subspace $j")
      val row = lut.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements()) throw new IllegalArgumentException(
        s"adc_sum code $c out of range 0..${row.numElements() - 1} in subspace $j")
      if (row.isNullAt(c)) throw new IllegalArgumentException(
        s"adc_sum: null lut entry $c in subspace $j")
      acc += row.getDouble(c)
      j += 1
    }
    acc
  }

  /** SDC: `table(j)(a)(b)` is subspace j's codeword-dot entry — an
    * m·k² literal carried as a reference object. Static for codegen.
    */
  def sdc(ca: ArrayData, cb: ArrayData, table: Array[Array[Array[Double]]]): Double = {
    val m = table.length
    if (ca.numElements() != m || cb.numElements() != m) throw new IllegalArgumentException(
      s"sdc_sum subspace mismatch: table has $m, codes ${ca.numElements()}/${cb.numElements()}")
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (ca.isNullAt(j) || cb.isNullAt(j)) throw new IllegalArgumentException(
        s"sdc_sum: null code in subspace $j")
      val t = table(j)
      val a = ca.getInt(j)
      val b = cb.getInt(j)
      if (a < 0 || a >= t.length || b < 0 || b >= t(a).length)
        throw new IllegalArgumentException(
          s"sdc_sum codes ($a, $b) out of range 0..${t.length - 1} in subspace $j")
      acc += t(a)(b)
      j += 1
    }
    acc
  }

  def adc_sum(lut: Column, codes: Column): Column =
    ColumnBridge.column(AdcSum(ColumnBridge.expression(lut), ColumnBridge.expression(codes)))

  def sdc_sum(ca: Column, cb: Column, table: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(SdcSum(ColumnBridge.expression(ca), ColumnBridge.expression(cb), table))

  private[functions] def intArray(t: DataType): Boolean = t match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }
}

case class AdcSum(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"adc_sum needs (array<array<double>>, array<int>), got ($l, $r)")
    }

  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    CodeSum.adc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) => s"graft.functions.CodeSum.adc($l, $c)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

case class SdcSum(left: Expression, right: Expression,
                  table: Array[Array[Array[Double]]]) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (CodeSum.intArray(left.dataType) && CodeSum.intArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sdc_sum needs two array<int> code columns, got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(ca: Any, cb: Any): Any =
    CodeSum.sdc(ca.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("sdcTable", table, "double[][][]")
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CodeSum.sdc($a, $b, $tRef)")
  }

  // content-based equality: the synthesized equals compares the SDC
  // table Array by reference, defeating CSE/cache plan-matching (the
  // q46/r14 lesson; see LexiconIndex)
  override def equals(o: Any): Boolean = o match {
    case that: SdcSum => left == that.left && right == that.right &&
      java.util.Arrays.deepEquals(table.asInstanceOf[Array[AnyRef]],
        that.table.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    (left.hashCode * 31 + right.hashCode) * 31 +
      java.util.Arrays.deepHashCode(table.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SdcSum =
    copy(left = newLeft, right = newRight)
}
