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
}
