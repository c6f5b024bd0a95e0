package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All random-hyperplane LSH bucket keys of a normalized vector in ONE
  * custom Catalyst expression: for each of `numTables` tables, a
  * `bitsPerTable`-bit key whose bit b is set iff the Rademacher-plane
  * projection `dot(nv, plane(t,b))` is ≥ 0 (Charikar 2002 sign-random-
  * projection; ±1 planes per Achlioptas 2001 so the rule is
  * re-derivable in ANSI SQL — see the q26 oracle).
  *
  * Replaces the composable form (numTables × bitsPerTable separate
  * `DotProduct(nv, planeLiteral)` Column expressions summed through
  * when/otherwise chains — 96 expression evaluations per row, each
  * unpacking the vector and a 64-element array literal) with one tight
  * pass: the ±1 sign matrix is computed once per
  * (numTables, bitsPerTable, dim) and cached executor-side, and each
  * projection is a primitive loop in the SAME left-to-right fold order
  * as [[DotProduct.compute]], so sign decisions — and therefore
  * buckets — are bit-identical to the composable form and the SQL
  * oracle mirror.
  *
  * Input `array<double>`; output `array<bigint>` of length `numTables`
  * (index = table); null input → null.
  */
case class LshBuckets(child: Expression, numTables: Int, bitsPerTable: Int)
    extends UnaryExpression {

  require(numTables > 0 && bitsPerTable > 0 && bitsPerTable <= 63,
    s"lsh_buckets needs 1..63 bits per table, got numTables=$numTables bits=$bitsPerTable")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"lsh_buckets needs array<double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], numTables, bitsPerTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBuckets.compute($c, $numTables, $bitsPerTable)")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {

  /** Deterministic ±1 plane component for (table, bit, dim-index): sign
    * from md5 parity of `"t|b|d"` (low bit of the first digest byte).
    * The single source of truth for the plane rule — `Similarity.planes`
    * and the q26 oracle SQL mirror this exactly.
    */
  def planeComp(t: Int, b: Int, d: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$t|$b|$d".getBytes("UTF-8"))
    if ((h(0) & 1) == 0) 1.0 else -1.0
  }

  /** Flattened ±1 sign matrix, laid out [(t*bitsPerTable + b)*dim + d].
    * Cached per (numTables, bitsPerTable, dim): md5-ing
    * tables×bits×dim strings is ~ms-scale work that must not run per
    * row; the cache is executor-local and tiny (one double per sign).
    */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def signs(numTables: Int, bitsPerTable: Int, dim: Int): Array[Double] =
    signCache.computeIfAbsent((numTables, bitsPerTable, dim), { key =>
      val (nt, bt, dm) = key
      val out = new Array[Double](nt * bt * dm)
      var t = 0
      while (t < nt) {
        var b = 0
        while (b < bt) {
          val base = (t * bt + b) * dm
          var d = 0
          while (d < dm) {
            out(base + d) = planeComp(t, b, d)
            d += 1
          }
          b += 1
        }
        t += 1
      }
      out
    })

  /** Static for codegen. Projection fold order is d = 0..dim-1, same as
    * [[DotProduct.compute]], so the ≥0 sign decision matches the
    * composable form bit-for-bit.
    */
  def compute(nv: ArrayData, numTables: Int, bitsPerTable: Int): ArrayData = {
    val dim = nv.numElements()
    val sg = signs(numTables, bitsPerTable, dim)
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) { v(d) = nv.getDouble(d); d += 1 }
    val keys = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var key = 0L
      var b = 0
      while (b < bitsPerTable) {
        val base = (t * bitsPerTable + b) * dim
        var acc = 0.0
        var i = 0
        while (i < dim) {
          acc += v(i) * sg(base + i)
          i += 1
        }
        if (acc >= 0) key |= 1L << b
        b += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }

  def lsh_buckets(nv: Column, numTables: Int, bitsPerTable: Int): Column =
    ColumnBridge.column(LshBuckets(ColumnBridge.expression(nv), numTables, bitsPerTable))
}
