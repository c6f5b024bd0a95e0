package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ⊕ HTML boilerplate extraction — the web-corpus stage every
  * large-scale training pipeline runs before quality scoring (CCNet /
  * trafilatura lineage: strip markup, drop chrome, keep main text).
  * The reference consumes API-clean text (`app.py:49` reads fields,
  * never markup), but a 100 TB web crawl does not arrive clean; this
  * family makes the engine able to start from raw HTML.
  *
  * All ops are row-local codegen'd expression chains (regexp_replace /
  * regexp_extract_all / replace) — they ride the scan with no shuffle
  * and no UDF, and every regex sticks to the RE2-safe subset
  * (non-greedy quantifiers and inline flags only, no lookaround, no
  * backreferences) so the DuckDB oracle can run the IDENTICAL
  * patterns.
  *
  * Determinism contract: fixed strip order (script/style blocks →
  * tags → entity decode → whitespace collapse), so both engines
  * produce byte-identical text and the q144 oracle hash-matches md5s.
  * Entity decode is the single-pass
  * [[graft.functions.HtmlEntities]] scanner — all numeric character
  * references plus a 30-name table, output never re-scanned (the
  * no-cascade rule: `&amp;lt;` → literal `&lt;`) — whose semantics
  * equal a global leftmost-non-overlapping regex pass, so the oracle
  * replays it with the identical RE2-safe alternation.
  */
object Html {

  private val ScriptRe = "(?is)<script[^>]*>.*?</script>"
  private val StyleRe  = "(?is)<style[^>]*>.*?</style>"
  private val TagRe    = "<[^>]*>"
  private val LinkRe   = "(?is)<a[^>]*>(.*?)</a>"

  /** General entity decode — numeric (`&#233;`/`&#x2014;`) + the
    * common named tail, single pass, no cascade
    * ([[graft.functions.HtmlEntities]]).
    */
  private def decodeEntities(c: Column): Column =
    graft.functions.HtmlEntities.decode_html_entities(c)

  /** Markup → text: drop script/style blocks wholesale, strip every
    * remaining tag, decode entities, collapse whitespace.
    */
  def stripTags(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(html, ScriptRe, " "), StyleRe, " ")
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** Number of anchor tags in the document. */
  def linkCount(html: Column): Column = regexp_count(html, lit("(?i)<a[\\s>]"))

  /** Fraction of the extracted text that came from inside `<a>`
    * anchors — THE boilerplate signal (nav bars and footers are
    * link-dense; real prose is not). 0.0 for empty documents.
    */
  private def linkChars(html: Column): Column = aggregate(
    transform(regexp_extract_all(html, lit(LinkRe), lit(1)),
      s => length(stripTags(s))),
    lit(0), (acc, x) => acc + x)

  def linkTextFraction(html: Column): Column = {
    val total = length(stripTags(html))
    when(total > 0, linkChars(html).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Main-text extraction + boilerplate gate: the stripped text, its
    * anchor-text fraction, and `kept` = (≥ `minWords` words AND link
    * fraction ≤ `maxLinkFrac`) — the CCNet-style keep/drop decision.
    * Returns `struct(text, n_links, link_frac, kept)`.
    */
  /** The struct's `link_frac` is published tie-free: char counts are
    * exact integers, so the fraction ships as [[graft.ops.Exact.ratio]]
    * (floor division at 6 dp) — the raw-double form landed exactly on
    * `.5·10⁻⁶` boundaries (13/128, …; r15 guard-band sweep) where a
    * `round` publish is engine tie-rule convention. The keep decision
    * gates on the same quantized fraction.
    */
  def extractText(html: Column, minWords: Int = 5,
                  maxLinkFrac: Double = 0.2): Column = {
    val text = stripTags(html)
    val frac = graft.ops.Exact.ratio(
      linkChars(html), greatest(length(text), lit(1)), 6)
    val words = regexp_count(text, lit("\\S+"))
    struct(
      text.as("text"),
      linkCount(html).as("n_links"),
      frac.as("link_frac"),
      (words >= minWords && frac <= maxLinkFrac).as("kept"))
  }
}
