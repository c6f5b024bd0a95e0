package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ⊕ Jaro-Winkler string similarity (Winkler 1990, "String comparator
  * metrics and enhanced decision rules in the Fellegi-Sunter model of
  * record linkage") — the canonical entity-resolution comparator:
  * Jaro similarity (matches within a ⌊max(|a|,|b|)/2⌋−1 character
  * window, half-transposition penalty) plus the Winkler common-prefix
  * boost `j + ℓ·p·(1−j)` with scaling `p = 0.1` over at most ℓ ≤ 4
  * prefix characters, applied only when `j > 0.7`.
  *
  * Custom Catalyst `Expression` (SURVEY.md §4 preference (b)), the
  * [[SimHash64]] pattern: `(string, string) → double`, null-intolerant,
  * codegen emits a call to the static [[JaroWinkler.compute]] so the
  * comparison stays inside whole-stage codegen — pairwise scoring runs
  * in the hot inner loop of a blocked self-join, exactly where an
  * iterator break would hurt most.
  *
  * Cross-engine contract: this parameterization (p = 0.1, boost
  * threshold 0.7, prefix cap 4, matching over UTF-16 code units) is
  * verified bit-identical to DuckDB's `jaro_winkler_similarity` on
  * the q127 fixture (EntityResSpec pins martha/marhta = 0.961111…,
  * dixon/dicksonx, dwayne/duane, and empty/equal edge cases), which
  * is what licenses the exact hash oracle.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler needs (string, string), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static so generated code can call it directly. ASCII pairs (the
    * overwhelming case in id/name columns) run on the raw UTF-8 bytes
    * — `numChars == numBytes` proves every char is one byte — which
    * skips the per-evaluation String decode (two char[] + two String
    * allocations per pair; q131 scores 4.5M pairs at sf0.1). Any
    * non-ASCII input falls back to the code-unit form; EntityResSpec
    * pins the two paths equal on mixed fixtures.
    */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val na = a.numBytes(); val nb = b.numBytes()
    if (a.numChars() == na && b.numChars() == nb)
      computeBytes(a.getBytes, b.getBytes)
    else
      computeChars(a.toString, b.toString)
  }

  /** Byte-level twin of [[computeChars]] for ASCII inputs — identical
    * control flow, `Array[Byte]` instead of `String`.
    */
  def computeBytes(s1: Array[Byte], s2: Array[Byte]): Double = {
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - half) / m) / 3.0
    if (jaro > 0.7) {
      var pre = 0
      val cap = math.min(4, math.min(l1, l2))
      while (pre < cap && s1(pre) == s2(pre)) pre += 1
      jaro + pre * 0.1 * (1.0 - jaro)
    } else jaro
  }

  def computeChars(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - half) / m) / 3.0
    if (jaro > 0.7) {
      var pre = 0
      val cap = math.min(4, math.min(l1, l2))
      while (pre < cap && s1.charAt(pre) == s2.charAt(pre)) pre += 1
      jaro + pre * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
