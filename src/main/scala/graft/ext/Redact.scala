package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ⊕ PII detection + redaction for LLM training corpora (north-star
  * text op): emails, URLs, IPv4 addresses, and phone numbers are
  * counted and masked with stable placeholder tokens — the standard
  * pre-training scrub (public pipelines redact rather than drop, so
  * surrounding text survives).
  *
  * All pure `regexp_replace`/`regexp_count` column expressions:
  * row-local, codegen'd, shuffle-free — redaction throughput is scan
  * throughput. Patterns deliberately use only regex constructs shared
  * by Java's engine and RE2-style engines (character classes, bounded
  * repetition; no lookaround, no backreferences) so the DuckDB oracle
  * evaluates the identical automaton.
  *
  * [[redactAll]] applies masks in fixed order URL → email → IPv4 →
  * phone: URLs are masked first so their dotted hosts/paths can't be
  * re-matched as IPs or emails by later passes.
  */
object Redact {

  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Includes `@`/`:`/`~` so userinfo, ports, and tilde-paths are
    * swallowed by the URL mask instead of leaking to later passes. */
  val UrlRe: String   = "https?://[A-Za-z0-9._%+#?=&/@:~-]+"
  val Ipv4Re: String  = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  /** `+CC NNN-NNNN` / `C NNN NNNN`-shaped dialable numbers. */
  val PhoneRe: String = "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}"

  def countEmails(text: Column): Column = regexp_count(text, lit(EmailRe))
  def countUrls(text: Column): Column   = regexp_count(text, lit(UrlRe))
  def countIpv4(text: Column): Column   = regexp_count(text, lit(Ipv4Re))
  def countPhones(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Mask every PII occurrence with its placeholder token. */
  def redactAll(text: Column): Column = {
    val u = regexp_replace(text, UrlRe, "<URL>")
    val e = regexp_replace(u, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }

  /** ⊕ k-anonymity with progressive generalization (Sweeney 2002 —
    * the metadata-release side of corpus privacy, next to the text
    * side above): each row's quasi-identifier tuple is released at
    * the FIRST prefix level whose group reaches `k` members,
    * generalizing right-to-left — level 0 releases every QI, level
    * `i` wildcards the last `i` columns, level `qis.length` is full
    * suppression. A NULL QI value is a group of its own (null-safe
    * join semantics): rows sharing a NULL release at whatever level
    * that NULL group clears `k`, exactly like any other value.
    * Output: the input's `id`, one `<name>_out` per QI
    * (`*` where generalized), `anon_level`, and `group_n` (the size
    * of the group actually released — ≥ k by construction except at
    * full suppression, where it is the table size).
    *
    * Scale shape: ONE `rollup` aggregation computes every prefix
    * level's group sizes in a single map-side-combinable pass; the
    * level tables are distinct-QI-sized (≪ corpus) and BROADCAST
    * back, one left join per level — no row explosion, no window, no
    * per-level corpus re-shuffle. At 100 TB the corpus is touched
    * once.
    */
  def kAnonymize(df: org.apache.spark.sql.DataFrame, id: Column,
                 qis: Seq[(String, Column)], k: Long):
      org.apache.spark.sql.DataFrame = {
    require(qis.nonEmpty, "need at least one quasi-identifier")
    val names = qis.map(_._1)
    require(!names.contains("id"),
      "QI name 'id' collides with the id output column — alias the QI")
    require(names.forall(!_.startsWith("__")),
      "QI names starting with '__' collide with internal columns")
    val base = df.select(id.as("id") +: qis.map { case (n, c) => c.as(n) }: _*)
    // one pass: group sizes at every QI-prefix level (+ grand total);
    // grouping() markers disambiguate rollup nulls from data nulls
    val counts = base.rollup(names.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        names.map(n => grouping(col(n)).as(s"__g_$n")): _*)
    var out = base
    // level L (0 = full detail … names.length = fully suppressed):
    // the rollup stratum where the first (length - L) QIs are
    // concrete and the last L are rolled up
    for (level <- 0 to names.length) {
      val kept = names.take(names.length - level)
      val lvl = counts
        .filter(names.map(n =>
            col(s"__g_$n") === (if (kept.contains(n)) 0 else 1))
          .reduce(_ && _))
        .select(kept.map(n => col(n).as(s"__k_$n")) :+
          col("__n").as(s"__n$level"): _*)
      // null-SAFE join keys (<=>): a NULL QI value is a legitimate
      // group (the rollup's grouping() markers already separate it
      // from the stratum rows) — null-unsafe equality would silently
      // drop NULL-QI rows through every level to full suppression
      // even when their NULL group clears k (review round-15)
      out =
        if (kept.isEmpty) out.crossJoin(broadcast(lvl))
        else out.join(broadcast(lvl),
            kept.map(n => col(n) <=> col(s"__k_$n")).reduce(_ && _), "left")
          .drop(kept.map(n => s"__k_$n"): _*)
    }
    // first level whose group clears k; nothing clears → suppress
    val lvlCol = coalesce(
      (0 until names.length).map(l =>
        when(col(s"__n$l") >= k, lit(l))) :+ lit(names.length): _*)
    val withLvl = out.withColumn("anon_level", lvlCol)
    // QI at index i survives while fewer than (length - i) columns
    // are generalized: released iff anon_level <= length - 1 - i
    val outCols = names.zipWithIndex.map { case (n, i) =>
      when(col("anon_level") <= names.length - 1 - i, col(n))
        .otherwise(lit("*")).as(s"${n}_out")
    }
    val groupN = coalesce((0 to names.length).map(l =>
      when(col("anon_level") === l, col(s"__n$l"))): _*)
    withLvl.select(col("id") +: outCols :+
      col("anon_level") :+ groupN.as("group_n"): _*)
  }
}
