package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ⊕ General HTML entity decoding — the web-crawl reality behind
  * `graft.ext.Html` (reference consumes API-clean text, `app.py:49`;
  * a 100 TB crawl does not): numeric character references
  * (`&#233;` / `&#x2014;`) plus a fixed 30-name table of the common
  * named entities, decoded in ONE left-to-right pass whose output is
  * never re-scanned.
  *
  * Single-pass semantics ARE the no-cascade contract: `&amp;lt;`
  * yields the literal text `&lt;` (the decoded `&` is output, never
  * re-parsed), which subsumes the old fixed-order replace chain's
  * "`&amp;` last" rule and extends it to `&`-producing numeric forms
  * (`&#38;`). They are also exactly the semantics of a global
  * (leftmost, non-overlapping) regex pass, so the DuckDB oracle
  * replays the decode verbatim with
  * `string_split_regex` + `regexp_extract_all` over the identical
  * RE2-safe alternation and re-interleaves — hash-identical output
  * (q144).
  *
  * Decode rules, mirrored bit-for-bit by the oracle SQL
  * ([[HtmlEntities.EntityAlternation]] is the shared pattern):
  *  - `&#[0-9]{1,8};` (decimal) and `&#[xX][0-9a-fA-F]{1,6};` (hex)
  *    decode to their code point when valid: 9, 10, 13, or
  *    [32, 0x10FFFF] excluding surrogates [0xD800, 0xDFFF]; invalid
  *    references are left as-is (loud garbage beats silent
  *    corruption in token stats).
  *  - Code point 160 and `&nbsp;` decode to an ASCII space, so the
  *    downstream `\s+` whitespace collapse (ASCII-only in both RE2
  *    and Java) treats non-breaking spaces as whitespace.
  *  - Named entities require the terminating `;` and exact case;
  *    unknown names (`&foo;`) pass through untouched.
  *
  * Custom codegen `Expression` (SURVEY.md §4 preference (b), the
  * [[JaroWinkler]] pattern): one allocation-light scan per string
  * inside whole-stage codegen, vs the array materialization a
  * split/transform/rejoin plan would pay per row on the hot
  * extraction path.
  */
case class DecodeHtmlEntities(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"decode_html_entities needs string, got $other")
    }

  override protected def nullSafeEval(s: Any): Any =
    HtmlEntities.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HtmlEntities.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): DecodeHtmlEntities =
    copy(child = newChild)
}

object HtmlEntities {

  /** name → replacement, the fixed named-entity table. Kept in one
    * place so the oracle-side CASE ([[namedCaseSql]]) can never drift
    * from the scanner.
    */
  val Named: Seq[(String, String)] = Seq(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "deg" -> "°",
    "middot" -> "·", "laquo" -> "«", "raquo" -> "»",
    "sect" -> "§", "para" -> "¶", "bull" -> "•",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢", "times" -> "×", "divide" -> "÷",
    "plusmn" -> "±")

  private val NamedMap: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](64)
    Named.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** The token alternation both engines share (wrap as
    * `&(?:ALT);` to split, `&(ALT);` to extract). Numeric arms first;
    * the fixed names can't prefix-collide because every arm requires
    * the terminating `;`.
    */
  val EntityAlternation: String =
    "#[0-9]{1,8}|#[xX][0-9a-fA-F]{1,6}|" + Named.map(_._1).mkString("|")

  private def isValidCp(cp: Int): Boolean =
    cp == 9 || cp == 10 || cp == 13 ||
      (cp >= 32 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))

  /** Static so generated code calls it directly. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val end = matchEntity(str, i)
        if (end < 0) { sb.append(c); i += 1 }
        else {
          appendDecoded(sb, str, i + 1, end - 1)
          i = end
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Index just past the `;` of an entity starting at `i` (where
    * `str(i) == '&'`), or -1 — exactly the strings
    * `&(EntityAlternation);` matches.
    */
  private def matchEntity(str: String, i: Int): Int = {
    val n = str.length
    var j = i + 1
    if (j >= n) return -1
    if (str.charAt(j) == '#') {
      j += 1
      if (j >= n) return -1
      val hex = str.charAt(j) == 'x' || str.charAt(j) == 'X'
      if (hex) j += 1
      val start = j
      val cap = if (hex) 6 else 8
      while (j < n && j - start <= cap && isDigit(str.charAt(j), hex)) j += 1
      if (j - start < 1 || j - start > cap) -1
      else if (j < n && str.charAt(j) == ';') j + 1
      else -1
    } else {
      val start = j
      while (j < n && j - start <= 6 &&
        (str.charAt(j) >= 'a' && str.charAt(j) <= 'z' ||
          str.charAt(j) >= 'A' && str.charAt(j) <= 'Z')) j += 1
      if (j < n && j > start && str.charAt(j) == ';' &&
        NamedMap.containsKey(str.substring(start, j))) j + 1
      else -1
    }
  }

  private def isDigit(c: Char, hex: Boolean): Boolean =
    (c >= '0' && c <= '9') ||
      (hex && (c >= 'a' && c <= 'f' || c >= 'A' && c <= 'F'))

  /** Decode token `str[from, until)` (between `&` and `;`) into `sb`;
    * invalid numeric references re-emit the full original text.
    */
  private def appendDecoded(sb: java.lang.StringBuilder, str: String,
                            from: Int, until: Int): Unit = {
    if (str.charAt(from) == '#') {
      val hex = str.charAt(from + 1) == 'x' || str.charAt(from + 1) == 'X'
      val digits = str.substring(from + (if (hex) 2 else 1), until)
      val cp = java.lang.Long.parseLong(digits, if (hex) 16 else 10)
      if (cp <= Int.MaxValue && isValidCp(cp.toInt)) {
        if (cp == 160L) sb.append(' ') else sb.appendCodePoint(cp.toInt)
      } else {
        sb.append('&').append(str, from, until).append(';')
      }
    } else {
      sb.append(NamedMap.get(str.substring(from, until)))
    }
    ()
  }

  /** Oracle building block: the DuckDB expression decoding ONE
    * extracted token `e` (group 1 of `&(EntityAlternation);`) to its
    * replacement — the SQL mirror of [[appendDecoded]]. `cpSql` is
    * inlined at each use site (no lambda lets in SQL).
    */
  def decodeTokenSql(e: String): String = {
    val hexVal = s"CAST(list_sum(list_transform(range(1, length($e) - 1), j -> " +
      s"(strpos('0123456789abcdef', substr(lower($e), 2 + j, 1)) - 1) * " +
      s"16**(length($e) - 2 - j))) AS BIGINT)"
    val cp = s"(CASE WHEN substr($e, 2, 1) IN ('x', 'X') THEN $hexVal " +
      s"ELSE CAST(substr($e, 2) AS BIGINT) END)"
    val valid = s"($cp = 9 OR $cp = 10 OR $cp = 13 OR " +
      s"($cp >= 32 AND $cp <= 1114111 AND NOT ($cp >= 55296 AND $cp <= 57343)))"
    val namedArms = Named.map { case (k, v) =>
      val rep = if (v.length == 1 && v.charAt(0) < 128) {
        val esc = if (v == "'") "''" else v
        s"'$esc'"
      } else s"chr(${v.codePointAt(0)})"
      s"WHEN '$k' THEN $rep"
    }.mkString(" ")
    s"(CASE WHEN $e[1] = '#' THEN " +
      s"(CASE WHEN $valid THEN (CASE WHEN $cp = 160 THEN ' ' " +
      s"ELSE chr(CAST($cp AS INTEGER)) END) " +
      s"ELSE '&' || $e || ';' END) " +
      s"ELSE (CASE $e $namedArms END) END)"
  }

  /** Full oracle decode of a string expression `x`: split on the
    * shared pattern, decode each token, re-interleave — the leftmost
    * non-overlapping global pass, i.e. [[compute]] in SQL.
    */
  def decodeSql(x: String): String = {
    val split = s"string_split_regex($x, '&(?:$EntityAlternation);')"
    val ents = s"regexp_extract_all($x, '&($EntityAlternation);', 1)"
    s"array_to_string(list_transform(range(1, len($split) + 1), i -> " +
      s"$split[i] || (CASE WHEN i <= len($ents) THEN " +
      decodeTokenSql(s"$ents[i]") + " ELSE '' END)), '')"
  }

  /** Column-API entry point. */
  def decode_html_entities(c: Column): Column =
    ColumnBridge.column(DecodeHtmlEntities(ColumnBridge.expression(c)))
}
