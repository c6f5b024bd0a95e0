package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string ops X1–X9 from SURVEY.md §2.6 — all pure Catalyst
  * column expressions (codegen'd, no UDFs), mirroring the reference's
  * row-level string handling.
  */
object Text {

  /** X1 — whitespace normalize: `re.sub(r'\s+', ' ', s).strip()`
    * (`app.py:94-95,127`).
    */
  def cleanText(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** X3 — content assembly `f"{title} {selftext}"` lower-cased for
    * matching (`app.py:96`).
    */
  def contentOf(title: Column, selftext: Column): Column =
    concat_ws(" ", lower(title), lower(selftext))

  /** X4 — URL templating `f"https://www.reddit.com/{name}"`
    * (`app.py:69-70,106,140`).
    */
  def urlOf(prefix: String, c: Column): Column = concat(lit(prefix), c)

  /** X5 — deterministic set → display string:
    * `', '.join(sorted(list(s)))` (`app.py:68`). Also used for X6 where
    * the reference joins in nondeterministic Python set order — we sort
    * (documented deviation, SURVEY.md §2.6 X6).
    */
  def joinSorted(arr: Column, sep: String = ", "): Column =
    array_join(array_sort(arr), sep)

  /** X7 — truncate + ellipsis `body[:300] + '...'`
    * (`devcontainer.json:75`). Only appends the ellipsis when the value
    * was actually truncated (the v1 code appends unconditionally to
    * already-cleaned ≤300-char text; we guard on length so short rows
    * round-trip).
    */
  def truncateEllipsis(c: Column, n: Int): Column =
    when(length(c) > n, concat(substring(c, 1, n), lit("..."))).otherwise(c)

  /** X8 — prefix strip `sub_name_raw.replace('r/', '')` (`app.py:296`),
    * anchored so only a leading prefix is dropped.
    */
  def stripPrefix(c: Column, prefix: String): Column =
    regexp_replace(c, "^" + java.util.regex.Pattern.quote(prefix), "")

  /** F6 — non-blank-line input parser (`app.py:205,265-266`): split
    * multiline input, strip, drop empties, dedupe, sort (the reference
    * sorts the tuple for cache-key stability — we keep that
    * normalization).
    */
  def parseQueryLines(raw: String): Seq[String] =
    raw.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq.distinct.sorted
}
