package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** L2-normalize an `array<double>` in one pass; null for zero/empty
  * vectors (callers filter — mirrors the reference's skip-dirty-data
  * stance).
  *
  * The composable form — `transform(a, x -> x / sqrt(aggregate(...)))`
  * — re-evaluates the norm subtree per ELEMENT (Catalyst lambda bodies
  * are re-evaluated per invocation), making an O(d) row O(d²). This
  * expression computes the norm once and divides in a tight loop;
  * arithmetic (sequential sum of squares, sqrt, per-element divide)
  * matches the SQL-oracle formulation bit-for-bit.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"l2_normalize needs array<double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    L2Normalize.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("normalized")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $resultTerm =
         |  graft.functions.L2Normalize.compute($c);
         |if ($resultTerm == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $resultTerm;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {

  /** Static for codegen; returns null for zero/empty vectors. */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var sq = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); sq += x * x; i += 1 }
    if (sq <= 0.0) return null
    val norm = math.sqrt(sq)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  def l2_normalize(a: Column): Column =
    ColumnBridge.column(L2Normalize(ColumnBridge.expression(a)))
}
