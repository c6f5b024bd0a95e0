package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain curation operators for web-scale training corpora.
  *
  * The reference's curation story stops at text content
  * (`app.py:118-166` quality gates); a web-crawl pipeline needs the
  * URL axis too: parse the location, collapse it to the registered
  * (pay-level) domain, aggregate per-domain statistics, and drop
  * documents from blocklisted domains — the C4/RefinedWeb-style
  * provenance gates.
  *
  * Scale notes (100 TB): parsing and domain extraction are row-local
  * codegen'd regex/array expressions — they ride the scan and never
  * shuffle. `domainStats` is one hash aggregation on the domain key
  * (map-side partial aggregation applies). Blocklist filtering is a
  * broadcast anti-join for a table-sized list, or a literal `isin`
  * (pure filter, no shuffle) for a small inline list. Domains are a
  * classic skew axis (a handful of hosts dominate a crawl) — counts
  * are algebraic aggregates so the partial-agg path already absorbs
  * hot domains; anything holistic should go through the sketch
  * family (q34/q49/q77) keyed by domain.
  */
object UrlOps {

  /** One regex, five capture groups: scheme, host, port, path,
    * query. Userinfo is consumed (not captured); the fragment is
    * excluded by the query group's `[^#]*`. Shared verbatim with the
    * DuckDB oracle (both engines accept this POSIX-ish subset — no
    * backreferences, no lookaround).
    */
  val UrlPartsRe: String =
    "^([a-z][a-z0-9+.-]*)://(?:[^/@?#]*@)?([^/:?#]+)(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?"

  def scheme(url: Column): Column = nullIfEmpty(regexp_extract(url, UrlPartsRe, 1))
  def host(url: Column): Column   = nullIfEmpty(regexp_extract(url, UrlPartsRe, 2))
  def port(url: Column): Column   =
    nullIfEmpty(regexp_extract(url, UrlPartsRe, 3)).cast("int")
  def path(url: Column): Column   = nullIfEmpty(regexp_extract(url, UrlPartsRe, 4))
  def query(url: Column): Column  = nullIfEmpty(regexp_extract(url, UrlPartsRe, 5))

  private def nullIfEmpty(c: Column): Column = when(c =!= "", c)

  /** Second-level labels that act as public suffixes when paired
    * with a two-letter country code (`co.uk`, `com.au`, `ac.jp`,
    * …). A deliberate heuristic subset of the public-suffix list —
    * deterministic, closed, and mirrored in the oracle — not a
    * bundled copy of the full PSL.
    */
  val MultiPartSuffixes: Seq[String] =
    Seq("co", "com", "net", "org", "gov", "ac", "edu")

  /** Registered (pay-level) domain of a host: the last two labels,
    * or the last three when the second-to-last label is a
    * [[MultiPartSuffixes]] entry under a two-letter TLD
    * (`a.b.site.co.uk` → `site.co.uk`, `a.b.site.com` →
    * `site.com`). Row-local array ops; hosts with fewer than two
    * labels pass through unchanged.
    */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val lastTwo   = array_join(slice(labels, greatest(n - 1, lit(1)), lit(2)), ".")
    val lastThree = array_join(slice(labels, greatest(n - 2, lit(1)), lit(3)), ".")
    val ccSuffix = n >= 3 &&
      element_at(labels, -2).isin(MultiPartSuffixes: _*) &&
      length(element_at(labels, -1)) === 2
    when(n <= 1, hostCol).when(ccSuffix, lastThree).otherwise(lastTwo)
  }

  /** Per-registered-domain corpus statistics: document count,
    * distinct languages, mean document length, how many documents
    * carry a query string / an explicit port. One hash aggregation
    * on the domain key.
    */
  def domainStats(docs: DataFrame, urlCol: Column, langCol: Column,
                  nCharsCol: Column): DataFrame = {
    docs
      .select(
        registeredDomain(host(urlCol)).as("domain"),
        langCol.as("__lang"), nCharsCol.as("__nc"),
        query(urlCol).isNotNull.cast("int").as("__hq"),
        port(urlCol).isNotNull.cast("int").as("__hp"))
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("__lang")).as("n_langs"),
        round(avg(col("__nc")), 4).as("avg_chars"),
        sum(col("__hq")).as("n_query"),
        sum(col("__hp")).as("n_port"))
  }

  /** Drop rows whose domain is on the blocklist. A literal list
    * compiles to a pure `isin` filter (rides the scan, no shuffle);
    * use [[filterBlocklistTable]] when the list is itself a table.
    */
  def filterBlocklist(df: DataFrame, domainCol: Column,
                      blocked: Seq[String]): DataFrame =
    if (blocked.isEmpty) df else df.filter(!domainCol.isin(blocked: _*))

  /** Table-sized blocklist: broadcast left-anti join on the domain
    * (first column of `blocked`; renamed internally so the join never
    * collides with a same-named column in `df`).
    */
  def filterBlocklistTable(df: DataFrame, domainCol: Column,
                           blocked: DataFrame): DataFrame = {
    val b = blocked.select(blocked.columns.head).toDF("__blocked_domain")
    df.join(broadcast(b), domainCol === col("__blocked_domain"), "left_anti")
  }

  /** Tracking parameters stripped by [[canonicalize]]: any name
    * starting `utm_`, plus this literal set. Deterministic, closed,
    * oracle-mirrored — the common-crawl subset, not a full adtech
    * registry.
    */
  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")

  /** ⊕ URL canonicalization — the crawl-dedup key: the same page
    * arrives as `HTTP://Site.com:80/p/?utm_source=x` and
    * `http://site.com/p`, and fetch-level dedup/frontier scheduling
    * needs one canonical string per logical resource. Rules (all
    * row-local codegen'd string/array ops, no shuffle):
    *
    *  - scheme and host lowercased; userinfo and fragment dropped;
    *  - default ports removed (`http:80`, `https:443`), others kept;
    *  - empty path → `/`; ONE trailing slash stripped from non-root
    *    paths (path case preserved — paths are case-sensitive);
    *  - query params with tracking names removed (`utm_*` prefix +
    *    [[TrackingParams]]); survivors sorted lexicographically by
    *    their full `k=v` string; empty query dropped.
    *
    * Unparseable URLs (no host) canonicalize to null — callers route
    * them to quarantine, the S5 tolerance stance.
    */
  def canonicalize(url: Column): Column = {
    // case-insensitive parse (HTTP://Site.Com is the whole point);
    // (?i) is shared Java-regex/RE2 syntax so the oracle reuses it
    val re = "(?i)" + UrlPartsRe
    def part(i: Int): Column =
      when(regexp_extract(url, re, i) =!= "", regexp_extract(url, re, i))
    val sch = lower(part(1))
    val h = lower(part(2))
    val p = part(3).cast("int")
    val portPart = when(p.isNull ||
        (sch === "http" && p === 80) || (sch === "https" && p === 443), "")
      .otherwise(concat(lit(":"), p.cast("string")))
    val path0 = coalesce(part(4), lit(""))
    val path1 = when(path0 === "", "/").otherwise(path0)
    val pathPart = when(path1 =!= "/" && endswith(path1, lit("/")),
      substr(path1, lit(1), length(path1) - 1)).otherwise(path1)
    val kept = filter(split(coalesce(part(5), lit("")), "&"), kv => {
      val name = substring_index(kv, "=", 1)
      kv =!= "" && !startswith(name, lit("utm_")) &&
        !name.isin(TrackingParams: _*)
    })
    val queryPart = when(size(kept) > 0,
      concat(lit("?"), array_join(array_sort(kept), "&"))).otherwise(lit(""))
    when(h.isNotNull && sch.isNotNull,
      concat(sch, lit("://"), h, portPart, pathPart, queryPart))
  }
}
