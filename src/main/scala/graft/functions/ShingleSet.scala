package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-word shingles of cleaned lower-cased text as ONE custom
  * expression — byte-identical to the composable form
  * `array_distinct(zip_with-of-slices(split(trim(regexp_replace(lower(t),
  * '\s+', ' ')), ' ')))` ([[graft.ext.Dedup.shingles]]'s previous
  * body, and therefore to every DuckDB oracle mirror), but computed in
  * a single pass without materializing the token array, k shifted
  * slices, and k-1 zipped intermediates per row. This chain sits under
  * four near-dup queries (MinHash, SimHash, containment, clusters), so
  * its per-row constant factor is the family's floor.
  *
  * Semantics replicated exactly:
  *  - `lower` = `UTF8String.toLowerCase` (what Spark's Lower emits);
  *  - `regexp_replace(_, "\\s+", " ")` = Java regex, no UNICODE flag;
  *  - `trim` strips U+0020 ONLY (Spark's StringTrim — NOT Java
  *    `String.trim`, which also strips control chars);
  *  - `split(s, " ")` with limit -1, so empty text yields [""] and a
  *    short token list yields the same empty-shingle result;
  *  - distinct preserves first occurrence (array_distinct).
  * Null input → null; fewer than k tokens → empty array (not null).
  */
case class ShingleSet(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle_set needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"shingle_set needs string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("shingles")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $resultTerm =
         |  graft.functions.ShingleSet.compute($c, $k);
         |${ev.value} = $resultTerm;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Static for codegen; never null for non-null input. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    // lower exactly as Spark's Lower does, then collapse+trim on the
    // JVM string (same Java regex Spark's regexp_replace compiles)
    val collapsed = ws.matcher(text.toLowerCase.toString).replaceAll(" ")
    var b = 0
    var e = collapsed.length
    while (b < e && collapsed.charAt(b) == ' ') b += 1
    while (e > b && collapsed.charAt(e - 1) == ' ') e -= 1
    val clean = collapsed.substring(b, e)
    val w = clean.split(" ", -1)
    val n = w.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((n - k + 1) * 2)
    var i = 0
    while (i <= n - k) {
      val sb = new java.lang.StringBuilder(w(i))
      var j = 1
      while (j < k) {
        sb.append(' ').append(w(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = UTF8String.fromString(it.next())
      o += 1
    }
    new GenericArrayData(out)
  }

  def shingle_set(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(text), k))
}
