package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as one custom Catalyst expression: for seeds
  * 0..n-1, the lexicographic min over the shingle set of
  * `md5("<seed>|" || shingle)` (lowercase hex) — byte-identical to the
  * composable `array_min(transform(sh, s -> md5(concat('<i>|', s))))`
  * form and therefore to the DuckDB oracle SQL, but computed in a
  * single pass with one reused digest instance and no intermediate
  * 8×|shingles| hex-string arrays (the HOF form materializes one
  * transformed array per seed). Null for empty shingle sets.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $resultTerm =
         |  graft.functions.MinHashSig.compute($c, $numHashes);
         |if ($resultTerm == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $resultTerm;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = hexChars(b >>> 4)
      out(i * 2 + 1) = hexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Static for codegen; null for empty input. */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val md = digests.get()
    val mins = new Array[String](numHashes)
    val seedPrefixes = Array.tabulate(numHashes)(i => s"$i|".getBytes("UTF-8"))
    var any = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        val sBytes = shingles.getUTF8String(i).getBytes
        var h = 0
        while (h < numHashes) {
          md.reset()
          md.update(seedPrefixes(h))
          md.update(sBytes)
          val hexed = hex(md.digest())
          if (mins(h) == null || hexed.compareTo(mins(h)) < 0) mins(h) = hexed
          h += 1
        }
      }
      i += 1
    }
    // all-null input would yield an array of nulls under a
    // containsNull=false contract — return null signature instead
    if (!any) return null
    new GenericArrayData(mins.map(UTF8String.fromString))
  }

  def minhash_sig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))
}
