package graft

import org.apache.spark.sql.functions._
import graft.ext.Html

/** [[graft.ext.Html]] — markup strip / entity decode / boilerplate gate. */
class HtmlSpec extends SparkSuite {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(Html.stripTags($"h")).as[String].head()

  test("stripTags: tags out, script/style blocks dropped wholesale, whitespace collapsed") {
    assert(strip("<p>hello <b>world</b></p>") == "hello world")
    assert(strip("<script>var a = '<p>not text</p>';</script>after") == "after")
    assert(strip("<style>p { color: red }</style>before") == "before")
    assert(strip("a\n\n  b\t c") == "a b c")
  }

  test("entity decode: named + numeric, &amp; decoded last (no double-decode cascade)") {
    assert(strip("Q &amp; A") == "Q & A")
    assert(strip("&lt;tag&gt; &quot;q&quot; &#39;s&#39;") == "<tag> \"q\" 's'")
    // &amp;lt; is literal "&lt;" after ONE decode — must NOT cascade to "<"
    assert(strip("&amp;lt;") == "&lt;")
  }

  test("general numeric references: decimal, hex, control/surrogate/oob left as-is") {
    assert(strip("Caf&#233; costs &#x20AC;5") == "Café costs €5")
    assert(strip("em&#x2014;dash") == "em—dash")
    assert(strip("astral &#x1F600; ok") == "astral 😀 ok") // > BMP
    // invalid code points pass through untouched — loud, not corrupted
    assert(strip("bad &#xD800; &#0; &#1114112; end") == "bad &#xD800; &#0; &#1114112; end")
    assert(strip("not an entity &#; &#xG1; &# x") == "not an entity &#; &#xG1; &# x")
  }

  test("named tail beyond the original six; unknown names pass through") {
    assert(strip("a &mdash; b&hellip; &copy;2024 &laquo;q&raquo;") ==
      "a — b… ©2024 «q»")
    assert(strip("&foo; &verylongname; &x;") == "&foo; &verylongname; &x;")
  }

  test("nbsp — named or numeric 160 — becomes plain space and collapses") {
    assert(strip("a&nbsp;&nbsp;b&#160;c&#xA0;d") == "a b c d")
  }

  test("&-producing decodes never cascade: single pass, output not re-scanned") {
    assert(strip("&#38;lt;") == "&lt;")   // numeric & + literal lt;
    assert(strip("&amp;amp;") == "&amp;") // double-encoded amp
    assert(strip("&#x26;#38;") == "&#38;")
  }

  test("script block with embedded '<' does not break tag stripping") {
    assert(strip("<script>if (1 < 2) x();</script><p>kept</p>") == "kept")
  }

  test("linkCount and linkTextFraction measure anchor density") {
    val df = Seq(
      "<nav><a href='/'>Home</a><a href='/a'>About</a></nav><p>one two three four five six seven eight</p>",
      "<a href='/'>x</a>").toDF("h")
      .select(Html.linkCount($"h").as("n"),
        round(Html.linkTextFraction($"h"), 4).as("f"))
    val rows = df.as[(Int, Double)].collect()
    assert(rows(0)._1 == 2)
    // link chars = "Home"+"About" = 9; text = "HomeAbout one ... eight"
    assert(rows(0)._2 > 0.15 && rows(0)._2 < 0.30)
    assert(rows(1) == ((1, 1.0))) // all text is anchor text
  }

  test("extractText gate: prose kept, link-farm and stub dropped") {
    val prose = "<p>" + Seq.fill(20)("word").mkString(" ") + "</p><a href='/'>x</a>"
    val farm = "<a href='/1'>one link</a><a href='/2'>two link</a><a href='/3'>three link</a>"
    val stub = "<p>too short</p>"
    val out = Seq(prose, farm, stub).toDF("h")
      .select(Html.extractText($"h", minWords = 5, maxLinkFrac = 0.2).as("e"))
      .select($"e.kept").as[Boolean].collect()
    assert(out.toSeq == Seq(true, false, false))
  }

  test("ops are row-local: no Exchange in the extraction plan") {
    val plan = Tables_docs.select(Html.extractText(concat(lit("<p>"), $"text", lit("</p>"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction must ride the scan:\n$plan")
  }

  private def Tables_docs = graft.sources.Tables.documents(spark, sfDir)
}
