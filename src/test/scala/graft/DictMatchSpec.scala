package graft

import org.apache.spark.sql.functions._

import graft.functions.DictMatch
import graft.ops.Match

class DictMatchSpec extends SparkSuite {
  import spark.implicits._

  test("hand case: classic AC dictionary with overlapping suffixes") {
    // he/she/his/hers — the Aho-Corasick paper's example: "ushers"
    // contains she, he, hers (not his); match order = dictionary order
    val dict = Seq("he", "she", "his", "hers")
    val got = Seq("ushers").toDF("t")
      .select(DictMatch.dict_matches(col("t"), dict).as("m"),
        DictMatch.dict_contains_any(col("t"), dict).as("any"))
      .head()
    assert(got.getSeq[String](0) == Seq("he", "she", "hers"))
    assert(got.getBoolean(1))
  }

  test("case-insensitive mode lowers needles and haystack like Spark's lower") {
    val dict = Seq("SPARK", "Straße", "ÉCOLE")
    val rows = Seq("runs on Apache Spark", "die strasse", "une école", "nothing")
      .toDF("t")
      .select(DictMatch.dict_matches(col("t"), dict).as("m"))
      .collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("spark"))
    // UTF8String.toLowerCase("Straße") keeps ß (no ss expansion) — so
    // "strasse" must NOT match; the needle list is emitted lowered
    assert(rows(1).isEmpty)
    assert(rows(2) == Seq("école"))
    assert(rows(3).isEmpty)
  }

  test("case-sensitive automaton matches bytes exactly") {
    val a = DictMatch.automaton(Seq("Spark", "spark"), caseInsensitive = false)
    val rows = Seq("Apache Spark", "sparkly", "SPARK").toDF("t")
      .select(DictMatch.dict_matches(col("t"), a).as("m"))
      .collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("Spark"))
    assert(rows(1) == Seq("spark"))
    assert(rows(2).isEmpty)
  }

  test("duplicate dictionary entries each emit (the filter-form contract)") {
    val got = Seq("abc").toDF("t")
      .select(DictMatch.dict_matches(col("t"), Seq("b", "x", "b")).as("m"))
      .head().getSeq[String](0)
    assert(got == Seq("b", "b"))
  }

  test("null text yields null; empty text matches nothing; empty needle rejected") {
    val dict = Seq("a")
    val rows = Seq(Some("xa"), None, Some("")).toDF("t")
      .select(DictMatch.dict_matches(col("t"), dict).as("m"),
        DictMatch.dict_contains_any(col("t"), dict).as("any"))
      .collect()
    assert(rows(0).getSeq[String](0) == Seq("a") && rows(0).getBoolean(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getSeq[String](0).isEmpty && !rows(2).getBoolean(1))
    intercept[IllegalArgumentException] { DictMatch.automaton(Seq("a", "")) }
  }

  test("property: automaton ≡ per-keyword contains chain on random texts/dicts") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abcd "
    def randStr(maxLen: Int): String =
      (0 until (1 + rnd.nextInt(maxLen))).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    for (round <- 0 until 8) {
      val dict = (0 until (1 + rnd.nextInt(12))).map(_ => randStr(4)).distinct
      val texts = (0 until 60).map(_ => randStr(40))
      val df = texts.toDF("t").select(col("t"),
        DictMatch.dict_matches(col("t"), dict).as("a"),
        Match.matchedKeywords(col("t"), dict).as("b"),
        DictMatch.dict_contains_any(col("t"), dict).as("ga"),
        Match.matchesAny(col("t"), dict).as("gb"))
      val diff = df.filter(col("a") =!= col("b") || col("ga") =!= col("gb"))
      assert(diff.isEmpty,
        s"round $round dict=$dict diverged: ${diff.collect().mkString("; ")}")
    }
  }

  test("multi-word phrases match as raw substrings across token boundaries") {
    val dict = Seq("data stream", "machine learning")
    val got = Seq("a Data Streaming engine").toDF("t")
      .select(DictMatch.dict_matches(col("t"), dict).as("m"))
      .head().getSeq[String](0)
    assert(got == Seq("data stream"))
  }

  test("plan size is O(1) in dictionary size (the CentroidArgmax contract)") {
    def planNodes(terms: Seq[String]): Int = {
      val df = Seq("x").toDF("t")
        .select(DictMatch.dict_matches(col("t"), terms).as("m"))
      df.queryExecution.optimizedPlan.expressions.map(_.collect { case e => e }.size).sum
    }
    val small = planNodes((1 to 4).map(i => s"term$i"))
    val large = planNodes((1 to 4096).map(i => s"term$i"))
    assert(small == large,
      s"plan grew with dictionary size: $small vs $large expression nodes")
  }

  test("10k-term dictionary over the fixture corpus ≡ driver-side contains scan") {
    // the q201 anchor at production-blocklist scale: 10,000 generated
    // terms (48 drawn from the fixture vocabulary incl. cross-token
    // phrases, the rest guaranteed never-hits) — the HOF chain is no
    // longer a usable comparator at this k (O(k) plan nodes, k text
    // scans per row), so equivalence is proven against a plain
    // driver-side contains scan over a 100-doc sample
    val vocab = Seq("scan", "table", "merge", "stream", "vector", "batch",
      "slow scan", "big table", "fast merge", "row order", "part hash", "the line")
    val dict = (vocab ++ vocab.map(v => s"$v x") ++ vocab.map(v => s"zq$v") ++
      (0 until 10000).map(i => f"zzterm$i%05d")).distinct
    assert(dict.size >= 10000)
    val docs = sources.Tables.documents(spark, sfDir).limit(100)
      .select(col("doc_id"), col("text"))
    val got = docs
      .select(col("doc_id"), col("text"),
        DictMatch.dict_matches(col("text"), dict).as("m"))
      .collect()
    for (r <- got) {
      val expect = dict.filter(t => r.getString(1).toLowerCase.contains(t))
      assert(r.getSeq[String](2) == expect, s"doc ${r.getLong(0)} diverged")
    }
    assert(got.exists(_.getSeq[String](2).nonEmpty), "sample should have hits")
  }

  test("early exit: a full-coverage dictionary terminates the scan") {
    // every term seen by position 3 of a 1M-char text — the nSeen ==
    // nTerms early exit keeps this instant even though hasOut fires at
    // every position
    val big = "ab" * 500000
    val got = Seq(big).toDF("t")
      .select(DictMatch.dict_matches(col("t"), Seq("a", "b", "ab")).as("m"))
      .head().getSeq[String](0)
    assert(got == Seq("a", "b", "ab"))
  }
}
