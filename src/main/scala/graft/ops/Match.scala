package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Keyword-matching ops: F5 (case-insensitive substring predicate, the
  * reference's core predicate `app.py:58,98,133`), A3 (matched-keyword
  * set per row, `app.py:98`), X11 (first-match-in-input-order,
  * `app.py:132-142`), F7 (relevance ordering of search hits,
  * `app.py:47`). All array higher-order functions — row-local, no
  * shuffle, whole-stage-codegen friendly, so they scale linearly with
  * the scan.
  */
object Match {

  /** F5 — `keyword.lower() in text.lower()`. */
  def containsKeyword(text: Column, keyword: String): Column =
    lower(text).contains(lit(keyword.toLowerCase))

  /** A3 — the set of keywords contained in `text`, in input order
    * (set comprehension at `app.py:98`). `filter` preserves the array
    * literal's order, making downstream "first match" well-defined.
    */
  def matchedKeywords(text: Column, keywords: Seq[String]): Column = {
    val kws = array(keywords.map(k => lit(k.toLowerCase)): _*)
    filter(kws, k => lower(text).contains(k))
  }

  /** X11 — scan keywords in input order, emit only the first contained
    * one (`for keyword ...: break`, `app.py:132-142`); null when none
    * match.
    */
  def firstMatch(text: Column, keywords: Seq[String]): Column =
    try_element_at(matchedKeywords(text, keywords), lit(1))

  /** Existence form of F5 over many keywords (the J3 semi-probe
    * predicate, `app.py:56-59`).
    */
  def matchesAny(text: Column, keywords: Seq[String]): Column =
    exists(array(keywords.map(k => lit(k.toLowerCase)): _*),
      k => lower(text).contains(k))

  /** F7 — relevance score for `sort="relevance"` (`app.py:47`): number
    * of distinct keywords hit. The reference delegates relevance to the
    * server; we define it as hit count (documented engine-side
    * definition).
    */
  def relevanceHits(text: Column, keywords: Seq[String]): Column =
    size(matchedKeywords(text, keywords))
}
