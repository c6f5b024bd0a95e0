package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSuite {
  import spark.implicits._

  private def parts(url: String)
      : (String, String, Option[Int], Option[String], Option[String]) = {
    val r = Seq(url).toDF("u")
      .select(
        UrlOps.scheme(col("u")).as("s"), UrlOps.host(col("u")).as("h"),
        UrlOps.port(col("u")).as("p"), UrlOps.path(col("u")).as("pa"),
        UrlOps.query(col("u")).as("q"))
      .head()
    (r.getString(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getInt(2)),
      Option(r.getString(3)), Option(r.getString(4)))
  }

  test("url parse: scheme/host/port/path/query, fragment excluded") {
    assert(parts("https://www.example.com/a/b?x=1&y=2#frag") ===
      (("https", "www.example.com", None, Some("/a/b"), Some("x=1&y=2"))))
    assert(parts("http://u:pw@host.io:8080/p") ===
      (("http", "host.io", Some(8080), Some("/p"), None)))
    assert(parts("https://host.io") === (("https", "host.io", None, None, None)))
    assert(parts("https://host.io?q=1") === (("https", "host.io", None, None, Some("q=1"))))
  }

  test("registered domain: suffix heuristic") {
    val got = Seq(
      "a.b.site.co.uk", "site.co.uk", "a.b.site.com", "site.com",
      "x.co", "localhost", "deep.sub.host.ac.jp", "svc.gov.uk",
      // 'com' as second-to-last but TLD not 2 letters -> plain last-two
      "a.com.org")
      .toDF("h").select(UrlOps.registeredDomain(col("h"))).as[String].collect()
    assert(got === Seq(
      "site.co.uk", "site.co.uk", "site.com", "site.com",
      "x.co", "localhost", "host.ac.jp", "svc.gov.uk", "com.org"))
  }

  test("domain stats aggregate + blocklist filter") {
    val docs = Seq(
      (1L, "en", 10L, "https://a.site.com/x?q=1"),
      (2L, "de", 20L, "https://b.site.com:443/y"),
      (3L, "en", 30L, "http://other.org/z"),
      (4L, "en", 40L, "http://bad.io/w"))
      .toDF("doc_id", "lang", "n_chars", "url")
    val stats = UrlOps.domainStats(docs, col("url"), col("lang"), col("n_chars"))
    val kept = UrlOps.filterBlocklist(stats, col("domain"), Seq("bad.io"))
      .orderBy("domain").collect()
    assert(kept.map(_.getString(0)).toSeq === Seq("other.org", "site.com"))
    val site = kept.find(_.getString(0) == "site.com").get
    assert(site.getLong(1) === 2L)       // n_docs
    assert(site.getLong(2) === 2L)       // n_langs
    assert(site.getDouble(3) === 15.0)   // avg_chars
    assert(site.getLong(4) === 1L)       // n_query
    assert(site.getLong(5) === 1L)       // n_port
  }

  test("canonicalize: case, ports, userinfo, fragments, slashes, tracking params") {
    def canon(url: String): Option[String] =
      Option(Seq(url).toDF("u").select(UrlOps.canonicalize(col("u"))).head().getString(0))
    // the poster child: five spellings, one resource
    val want = Some("http://site.com/Page/7?id=7")
    assert(canon("HTTP://Site.Com:80/Page/7?utm_source=feed&id=7&utm_medium=x") == want)
    assert(canon("http://user:pw@site.com/Page/7/?id=7#top") == want)
    assert(canon("http://site.com/Page/7?fbclid=abc&id=7") == want)
    // param sort is lexicographic over the full k=v string
    assert(canon("https://a.io/p?b=2&a=1") == Some("https://a.io/p?a=1&b=2"))
    // non-default ports survive; scheme-mismatched defaults survive too
    assert(canon("http://a.io:8080/x") == Some("http://a.io:8080/x"))
    assert(canon("https://a.io:80/x") == Some("https://a.io:80/x"))
    assert(canon("https://a.io:443/x") == Some("https://a.io/x"))
    // path normalization: empty → '/', root slash kept, ONE trailing stripped
    assert(canon("http://a.io") == Some("http://a.io/"))
    assert(canon("http://a.io/") == Some("http://a.io/"))
    assert(canon("http://a.io/x/") == Some("http://a.io/x"))
    // all-tracking query vanishes entirely
    assert(canon("http://a.io/x?utm_source=1&gclid=2") == Some("http://a.io/x"))
    // unparseable → null (quarantine, not garbage)
    assert(canon("not a url") == None)
  }

  test("blocklist table variant is a broadcast anti-join") {
    val df = Seq(("site.com", 1), ("bad.io", 2)).toDF("domain", "v")
    val blocked = Seq("bad.io").toDF("domain")
    val kept = UrlOps.filterBlocklistTable(df, col("domain"), blocked)
    assert(kept.as[(String, Int)].collect().toSeq === Seq(("site.com", 1)))
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join, got:\n$plan")
  }
}
