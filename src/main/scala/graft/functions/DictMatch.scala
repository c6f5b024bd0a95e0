package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching against a fixed dictionary as ONE
  * codegen'd Catalyst expression (SURVEY.md §4 preference (b)) — the
  * scale path for blocklist / PII-term / keyword screening where
  * [[graft.ops.Match.matchedKeywords]]'s per-keyword `contains` chain
  * is the right shape only for handfuls of terms. The HOF form embeds
  * one literal + one `Contains` per term, so a real curation
  * blocklist (10k-1M phrases — the C4 badwords / RefinedWeb-scale
  * dictionaries) would put O(k) nodes into the projection AND scan the
  * text once per term: O(k·n) work per row. Here the dictionary rides
  * ONE reference object holding an Aho-Corasick automaton (Aho &
  * Corasick 1975), the plan is O(1) in dictionary size, and each row
  * is scanned ONCE: O(n + matches) per row regardless of k — the
  * [[CentroidArgmax]] precedent applied to text.
  *
  * Semantics are exactly the composable form's, so the two are
  * interchangeable and oracle-mirrorable:
  *  - `dictMatches` ≡ `filter(array(terms.map(lit)), t ->
  *    contains(lower(text), t))` — the DISTINCT terms occurring as
  *    substrings, in dictionary input order (duplicate dictionary
  *    entries are preserved, matching the filter form);
  *  - `dictContainsAny` ≡ `exists(...)`, with first-hit early exit;
  *  - case-insensitive mode lowers needles AND haystack with
  *    `UTF8String.toLowerCase` — the same operator Spark's `lower`
  *    emits (NOT locale-sensitive `String.toLowerCase`; identical on
  *    ASCII, and identical to the engine's own `lower(text)` chain on
  *    all input by construction).
  * Matching is on UTF-8 BYTES: for valid UTF-8, byte-substring ≡
  * string-substring (`UTF8String.contains` is the same byte test), so
  * multi-word phrases and non-ASCII needles work unchanged.
  *
  * Scale shape: row-local, no shuffle, whole-stage codegen through a
  * static reference-object call; the automaton is built once on the
  * driver (dictionary-sized work, the centroid-collect stance) and
  * ships to executors inside the serialized plan.
  */
object DictMatch {

  private[functions] def checkText(t: DataType): TypeCheckResult = t match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dict_match needs string, got $other")
  }

  /** Build once, share across expressions (one serialized copy per
    * plan even when both the gate and the match-set are projected).
    */
  def automaton(terms: Seq[String], caseInsensitive: Boolean = true): DictAutomaton =
    new DictAutomaton(terms.toArray, caseInsensitive)

  /** `text → boolean`: does any dictionary term occur as a substring? */
  def dict_contains_any(text: Column, dict: DictAutomaton): Column =
    ColumnBridge.column(DictContainsExpr(ColumnBridge.expression(text), dict))

  def dict_contains_any(text: Column, terms: Seq[String]): Column =
    dict_contains_any(text, automaton(terms))

  /** `text → array<string>`: the matched terms, dictionary order. */
  def dict_matches(text: Column, dict: DictAutomaton): Column =
    ColumnBridge.column(DictMatchesExpr(ColumnBridge.expression(text), dict))

  def dict_matches(text: Column, terms: Seq[String]): Column =
    dict_matches(text, automaton(terms))
}

/** Driver-built Aho-Corasick automaton over the dictionary's UTF-8
  * bytes: goto edges (sorted byte-label binary search per node — the
  * memory-proportional-to-edges layout; a dense 256-way table would
  * cost 1 KiB/node ≈ 1 GiB at a 1M-node blocklist), BFS failure
  * links, and suffix-output links for enumerating every term ending
  * at a scan position. Build is O(total term bytes); matching is
  * O(text bytes · amortized-1 + matches).
  */
final class DictAutomaton(rawTerms: Array[String], val caseInsensitive: Boolean)
    extends Serializable {
  require(rawTerms.nonEmpty, "dict_match needs at least one term")
  require(rawTerms.forall(t => t != null && t.nonEmpty),
    "dict_match terms must be non-null and non-empty (an empty needle " +
      "matches everything — reject loudly rather than guess)")

  /** Needles as matched/emitted: lowered in CI mode via the same
    * UTF8String.toLowerCase Spark's `lower` uses.
    */
  val needles: Array[UTF8String] = rawTerms.map { t =>
    val u = UTF8String.fromString(t)
    if (caseInsensitive) u.toLowerCase else u
  }

  val nTerms: Int = needles.length

  // content-based equality — expression reference objects must equal
  // by content or Catalyst CSE/cache plan-matching silently fails
  // (the q46/r14 lesson; see LexiconIndex). The automaton arrays are
  // a pure function of (needles, caseInsensitive).
  override def equals(o: Any): Boolean = o match {
    case that: DictAutomaton =>
      caseInsensitive == that.caseInsensitive &&
        java.util.Arrays.equals(needles.asInstanceOf[Array[AnyRef]],
          that.needles.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.hashCode(needles.asInstanceOf[Array[AnyRef]]) * 31 +
      caseInsensitive.hashCode

  // --- frozen automaton arrays (built once in the constructor) ---
  // edgeLabels(u) = ascending byte labels (0..255 as Int); edgeTargets
  // aligns. fail(u) = longest proper suffix node. endTerms(u) = term
  // ids ending EXACTLY at u (ascending — dictionary order within a
  // node). outLink(u) = nearest fail-chain node with endTerms, or -1.
  // hasOut(u) = endTerms here or anywhere up the fail chain.
  val (edgeLabels: Array[Array[Int]], edgeTargets: Array[Array[Int]],
       fail: Array[Int], endTerms: Array[Array[Int]],
       outLink: Array[Int], hasOut: Array[Boolean]) = {
    import scala.collection.mutable
    val edges = mutable.ArrayBuffer(mutable.TreeMap.empty[Int, Int])
    val ends = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    var tid = 0
    while (tid < needles.length) {
      val bytes = needles(tid).getBytes
      var u = 0
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        u = edges(u).getOrElse(b, {
          edges += mutable.TreeMap.empty[Int, Int]
          ends += mutable.ArrayBuffer.empty[Int]
          val v = edges.length - 1
          edges(u)(b) = v
          v
        })
        i += 1
      }
      ends(u) += tid
      tid += 1
    }
    val n = edges.length
    val labels = Array.tabulate(n)(u => edges(u).keysIterator.toArray)
    val targets = Array.tabulate(n)(u => edges(u).valuesIterator.toArray)
    val fl = new Array[Int](n)
    val ol = Array.fill(n)(-1)
    val ho = new Array[Boolean](n)
    val et = Array.tabulate(n)(u => ends(u).toArray)
    ho(0) = et(0).nonEmpty // unreachable (terms non-empty) but total
    val queue = new java.util.ArrayDeque[Int]()
    var ci = 0
    while (ci < labels(0).length) {
      val v = targets(0)(ci)
      fl(v) = 0
      ol(v) = if (et(0).nonEmpty) 0 else -1
      ho(v) = et(v).nonEmpty || ho(0)
      queue.add(v)
      ci += 1
    }
    def goFrom(start: Int, b: Int): Int = {
      var u = start
      while (true) {
        val ls = labels(u)
        var lo = 0; var hi = ls.length - 1; var hit = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (ls(mid) == b) { hit = mid; lo = hi + 1 }
          else if (ls(mid) < b) lo = mid + 1
          else hi = mid - 1
        }
        if (hit >= 0) return targets(u)(hit)
        if (u == 0) return 0
        u = fl(u)
      }
      0
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      var i = 0
      while (i < labels(u).length) {
        val b = labels(u)(i)
        val v = targets(u)(i)
        val f = goFrom(fl(u), b)
        fl(v) = if (f == v) 0 else f
        ol(v) = if (et(fl(v)).nonEmpty) fl(v) else ol(fl(v))
        ho(v) = et(v).nonEmpty || ho(fl(v))
        queue.add(v)
        i += 1
      }
    }
    (labels, targets, fl, et, ol, ho)
  }

  private def haystack(text: UTF8String): Array[Byte] =
    (if (caseInsensitive) text.toLowerCase else text).getBytes

  /** One goto step: follow the edge, falling back through failure
    * links (amortized O(1) over a scan — each fallback strictly
    * shrinks the current depth, which only grows by 1 per byte).
    */
  private def step(from: Int, b: Int): Int = {
    var u = from
    while (true) {
      val ls = edgeLabels(u)
      var lo = 0; var hi = ls.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (ls(mid) == b) return edgeTargets(u)(mid)
        else if (ls(mid) < b) lo = mid + 1
        else hi = mid - 1
      }
      if (u == 0) return 0
      u = fail(u)
    }
    0
  }

  /** Static-shaped for codegen: first-hit early exit. */
  def containsAny(text: UTF8String): Boolean = {
    val bytes = haystack(text)
    var u = 0
    var i = 0
    while (i < bytes.length) {
      u = step(u, bytes(i) & 0xff)
      if (hasOut(u)) return true
      i += 1
    }
    false
  }

  /** Static-shaped for codegen: distinct matched terms, dictionary
    * order (duplicate dictionary entries each emitted — the
    * `filter(array(lits), contains)` contract). Early exit once every
    * term has been seen.
    */
  def matchedTerms(text: UTF8String): ArrayData = {
    val bytes = haystack(text)
    val seen = new Array[Boolean](nTerms)
    var nSeen = 0
    var u = 0
    var i = 0
    while (i < bytes.length && nSeen < nTerms) {
      u = step(u, bytes(i) & 0xff)
      if (hasOut(u)) {
        var w = if (endTerms(u).nonEmpty) u else outLink(u)
        while (w >= 0) {
          val ts = endTerms(w)
          var j = 0
          while (j < ts.length) {
            if (!seen(ts(j))) { seen(ts(j)) = true; nSeen += 1 }
            j += 1
          }
          w = outLink(w)
        }
      }
      i += 1
    }
    val out = new Array[Any](nSeen)
    var t = 0; var o = 0
    while (t < nTerms) {
      if (seen(t)) { out(o) = needles(t); o += 1 }
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `text → boolean` dictionary gate. */
case class DictContainsExpr(child: Expression, dict: DictAutomaton)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    DictMatch.checkText(child.dataType)

  override protected def nullSafeEval(text: Any): Any =
    dict.containsAny(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dictAutomaton", dict,
      classOf[DictAutomaton].getName)
    defineCodeGen(ctx, ev, t => s"$ref.containsAny($t)")
  }

  override protected def withNewChildInternal(newChild: Expression): DictContainsExpr =
    copy(child = newChild)
}

/** `text → array<string>` of matched terms, dictionary order. */
case class DictMatchesExpr(child: Expression, dict: DictAutomaton)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    DictMatch.checkText(child.dataType)

  override protected def nullSafeEval(text: Any): Any =
    dict.matchedTerms(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dictAutomaton", dict,
      classOf[DictAutomaton].getName)
    defineCodeGen(ctx, ev, t => s"$ref.matchedTerms($t)")
  }

  override protected def withNewChildInternal(newChild: Expression): DictMatchesExpr =
    copy(child = newChild)
}
