package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

class TextAnalysisSpec extends SparkSuite {

  test("templatePrefix: LCP(min,max) finds the shared header; strip removes it") {
    import spark.implicits._
    val docs = Seq(
      ("a", "SITE-A | home about | quick fox"),
      ("a", "SITE-A | home about | lazy dog"),
      ("a", "SITE-A | home zzz"),
      ("b", "other text entirely"),
      ("b", "different text entirely"),
      ("c", "single doc group")
    ).toDF("source", "text")
    val got = graft.ext.TextAnalysis.templatePrefix(docs, col("source"), col("text"))
      .orderBy("group").as[(String, Long, Int, String)].collect().toSeq
    // independent reference: pairwise LCP reduce over each group
    def lcpOf(xs: Seq[String]): String = xs.reduce { (x, y) =>
      x.zip(y).takeWhile { case (c1, c2) => c1 == c2 }.map(_._1).mkString
    }
    val aLcp = lcpOf(Seq("SITE-A | home about | quick fox",
      "SITE-A | home about | lazy dog", "SITE-A | home zzz"))
    assert(got == Seq(
      ("a", 3L, aLcp.length, aLcp),
      ("b", 2L, 0, ""),
      ("c", 1L, 16, "single doc group")))
    val stripped = graft.ext.TextAnalysis.stripPrefixes(docs, col("source"),
        col("text"),
        graft.ext.TextAnalysis.templatePrefix(docs, col("source"), col("text")))
      .select("stripped").as[String].collect()
    assert(stripped.count(_.startsWith("about")) == 2, s"strip failed: ${stripped.toSeq}")
    // empty-text group: bound < 1 guard (Spark sequence(1,0) ramp)
    val empty = Seq(("e", ""), ("e", "x")).toDF("source", "text")
    val eGot = graft.ext.TextAnalysis.templatePrefix(empty, col("source"), col("text"))
      .as[(String, Long, Int, String)].collect().head
    assert(eGot == ("e", 2L, 0, ""))
  }

  test("charEntropy: repetition → 0, uniform alphabet → ln k, language in between") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa aaaa aaaa"),            // one symbol → H = 0
      (2L, "abcd abcd abcd abcd"),       // uniform over 4 → H = ln 4
      (3L, "the quick brown fox jumps"), // natural text
      (4L, "   ")                        // empty after cleaning → dropped
    ).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.charEntropy(docs, col("doc_id"), col("text"))
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L), "empty doc must be dropped")
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L) == (1L, 12L, 1L, 0L))
    // uniform over 4 symbols: H = ln 4 ≈ 1.386294361 nats; each of the
    // 4 terms is floor(0.25·ln 0.25·1e9 + 0.5)
    val term = math.floor(0.25 * math.log(0.25) * 1e9 + 0.5).toLong
    assert(byId(2L) == (2L, 16L, 4L, -4L * term))
    // natural text sits strictly between the extremes
    assert(byId(3L)._4 > 0L && byId(3L)._4 < math.round(math.log(26.0) * 1e9))
  }

  test("charEntropy is invariant to partitioning") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = graft.ext.TextAnalysis.charEntropy(docs, col("doc_id"), col("text"))
    val b = graft.ext.TextAnalysis.charEntropy(docs.repartition(7), col("doc_id"), col("text"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
  import spark.implicits._

  test("tokenCount and unitCount") {
    val df = Seq("Hello,  world! 42", "one").toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("n"),
              TextAnalysis.unitCount(col("t")).as("u"))
    val got = df.as[(Int, Int)].collect().toSeq
    // "hello, world! 42" → 3 ws tokens; units: hello , world ! 4 2 → 6
    assert(got == Seq((3, 6), (1, 1)))
  }

  test("classifyByLexicon: argmax with deterministic tie-break and fallback") {
    val lex = Seq(
      "fr" -> Seq("le", "la", "et"),
      "en" -> Seq("the", "and", "of"))
    val df = Seq(
      "le chat et la table",   // fr
      "the cat and the dog",   // en
      "zzz qqq",               // none → und
      "le the",                // tie 1-1 → first label (fr) wins
    ).toDF("t").select(TextAnalysis.classifyByLexicon(col("t"), lex).as("l"))
    assert(df.as[String].collect().toSeq == Seq("fr", "en", "und", "fr"))
  }

  test("gopherRepetitionGate: hand-computed metrics on planted repetition") {
    // doc 1: duplicated line + repeated 2/3-grams, all short-doc caps blown
    //   w = [aa,bb,cc,aa,bb,cc,dd,ee,ff]; clean chars = 26; line chars = 24
    // doc 2: 30 distinct tokens over 3 lines — every rule passes
    val diverse = (0 until 30).map(i => f"tok$i%02d")
    val docs = Seq(
      (1L, "aa bb cc\naa bb cc\ndd ee ff"),
      (2L, diverse.grouped(10).map(_.mkString(" ")).mkString("\n"))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetitionGate(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getAs[Int]("n_lines") == 3)
    assert(r1.getAs[Double]("dup_line_frac") == 0.3333)      // 1 of 3 repeats
    assert(r1.getAs[Double]("dup_line_char_frac") == 0.3333) // 8 of 24 chars
    // fracs publish via Exact.ratio (FLOOR at 4 dp, tie-free — r15)
    assert(r1.getAs[Double]("top2_frac") == 0.3846)          // ⌊"aa bb"×2·5 / 26⌋
    assert(r1.getAs[Double]("top3_frac") == 0.6153)          // ⌊"aa bb cc"×2·8 / 26⌋
    assert(r1.getAs[Double]("top4_frac") == 0.4230)          // ⌊lex-min 1×11 / 26⌋
    assert(r1.getAs[Double]("dup5_frac") == 0.0)             // all 5-grams distinct
    assert(r1.getAs[Double]("dup10_frac") == 0.0)            // m = 9 < 10
    assert(!r1.getAs[Boolean]("ok_dup_line") && !r1.getAs[Boolean]("ok_top2")
      && r1.getAs[Boolean]("ok_dup5") && !r1.getAs[Boolean]("passes"))
    val r2 = got(1)
    assert(r2.getAs[Boolean]("passes"), r2.toString)
    assert(r2.getAs[Double]("dup_line_frac") == 0.0)
    // verdicts flip only their own rule: appending a repeated 5-gram
    // tail fails dup5 without touching the line rules
    val tail = Seq.fill(4)("pp qq rr ss tt").mkString(" ")
    val d3 = Seq((3L, diverse.mkString(" ") + " " + tail)).toDF("doc_id", "text")
    val r3 = TextAnalysis.gopherRepetitionGate(d3, col("doc_id"), col("text"))
      .collect()(0)
    assert(!r3.getAs[Boolean]("ok_dup5") && r3.getAs[Boolean]("ok_dup_line"),
      r3.toString)
  }

  test("repetitionPassesLocal ≡ gopherRepetitionGate verdict per document") {
    import spark.implicits._
    // every rule family exercised in BOTH verdicts, plus edge shapes
    // the row-local twin must not diverge on
    val diverse = (0 until 30).map(i => f"tok$i%02d")
    val handmade = Seq(
      1L -> "aa bb cc\naa bb cc\ndd ee ff",                 // dup line fail
      2L -> diverse.grouped(10).map(_.mkString(" ")).mkString("\n"), // pass
      3L -> (diverse.mkString(" ") + " " +
        Seq.fill(4)("pp qq rr ss tt").mkString(" ")),       // dup5 fail
      4L -> "",                                             // empty text
      5L -> "solo",                                         // one token
      6L -> "x\nx\nx\nx",                                   // all-dup lines
      7L -> "one two three four",                           // m < every n
      8L -> ("ga gb " * 20).trim,                           // top2 blowout
      9L -> ("  padded   whitespace\t\ttabs \n mixed   runs  \n end  "),
      10L -> (diverse.take(12).mkString(" ") + "\n" +
        diverse.take(12).mkString(" ") + "\n" +
        diverse.drop(12).mkString(" ")))                    // dup line mid
    // plus the q240-style decorated corpus: documents.parquet text
    // with the dup-first-line / stop-word-tail planting
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id") + 100L, // keep ids disjoint from handmade
        concat(
          when(col("doc_id") % 4 === 0, concat(col("text"), lit("\n"), col("text")))
            .otherwise(col("text")),
          when(col("doc_id") % 3 === 0, lit("\nthe and that have with."))
            .otherwise(lit(""))))
      .as[(Long, String)].collect().toSeq
    val all = handmade ++ corpus
    val df = all.toDF("doc_id", "text")
    val batch = TextAnalysis.gopherRepetitionGate(df, col("doc_id"), col("text"))
      .select(col("doc_id"), col("passes")).as[(Long, Boolean)]
      .collect().toMap
    val local = all.map { case (id, t) =>
      id -> TextAnalysis.repetitionPassesLocal(t) }.toMap
    assert(batch.keySet == local.keySet)
    val diffs = batch.keys.filter(id => batch(id) != local(id)).toSeq.sorted
    assert(diffs.isEmpty,
      s"row-local twin diverges from the batch gate on docs $diffs: " +
        diffs.take(5).map(id => s"$id batch=${batch(id)} local=${local(id)} " +
          s"text=${all.toMap.apply(id).take(60)}").mkString("; "))
    // non-vacuous: both verdicts occur in the fixture
    assert(batch.values.exists(identity) && batch.values.exists(!_),
      "fixture must exercise both verdicts")
  }

  test("qualityScore in [0,1]; repetitive text scores below diverse text") {
    val df = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon",
      "spam spam spam spam spam spam spam spam spam spam " +
        "spam spam spam spam spam spam spam spam spam spam",
    ).toDF("t").select(TextAnalysis.qualityScore(col("t")).as("q"))
    val Seq(diverse, repetitive) = df.as[Double].collect().toSeq
    assert(diverse > repetitive)
    assert(diverse >= 0 && diverse <= 1 && repetitive >= 0 && repetitive <= 1)
  }

  test("fingerprint invariant to case and spacing") {
    val df = Seq(("A  B\tc", "a b C"), ("x", "y")).toDF("p", "q")
      .select((TextAnalysis.fingerprint(col("p")) ===
               TextAnalysis.fingerprint(col("q"))).as("eq"))
    assert(df.as[Boolean].collect().toSeq == Seq(true, false))
  }

  test("Redact: counts and masks each PII kind; clean text untouched") {
    val s = "mail a.b+c@ex-1.org or x@y.io, see https://a.b/c?d=1&e=f " +
      "from 192.168.0.1 call +31 555 1234 end"
    val df = Seq(s, "no pii here").toDF("t").select(
      graft.ext.Redact.countEmails(col("t")).as("e"),
      graft.ext.Redact.countUrls(col("t")).as("u"),
      graft.ext.Redact.countIpv4(col("t")).as("i"),
      graft.ext.Redact.countPhones(col("t")).as("p"),
      graft.ext.Redact.redactAll(col("t")).as("r"))
    val rows = df.collect()
    assert((rows(0).getInt(0), rows(0).getInt(1), rows(0).getInt(2), rows(0).getInt(3))
      == (2, 1, 1, 1))
    val red = rows(0).getString(4)
    assert(red == "mail <EMAIL> or <EMAIL>, see <URL> from <IP> call <PHONE> end")
    assert(rows(1).getString(4) == "no pii here")
  }

  test("Redact: URL masked before its host can re-match as email/IP") {
    // the dotted numeric path would count as an IP if the URL were not
    // masked first
    val s = "ref https://10.0.0.1/a@b.cd end"
    val df = Seq(s).toDF("t")
      .select(graft.ext.Redact.redactAll(col("t")).as("r"))
    assert(df.as[String].head() == "ref <URL> end")
  }

  test("bm25: higher tf ranks higher; rare term outscores common term") {
    val docs = Seq(
      (1L, "rare common common filler filler filler"),
      (2L, "common filler filler filler filler filler"),
      (3L, "common common common filler filler filler"),
      (4L, "filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val scored = graft.ext.TextRank.bm25(docs,
        TextAnalysis.tokens(col("text")), Seq("rare", "common"))
      .select(col("doc_id"), col("bm25"))
      .as[(Long, Double)].collect().toMap
    // doc1 holds the only 'rare' occurrence -> top score
    assert(scored(1L) > scored(3L) && scored(3L) > scored(2L))
    assert(scored(4L) == 0.0)
    // more occurrences of the same term -> strictly higher (same dl)
    assert(scored(3L) > scored(2L))
  }

  test("vocabulary: tf/df hand-computed, min-df gate applied") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana banana date")
    ).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(docs, col("doc_id"), col("text"), minDocFreq = 2L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // apple/cherry/date have df=1 -> gated out; banana tf=4, df=3
    assert(v == Map("banana" -> (4L, 3L)))
    val all = TextAnalysis.vocabulary(docs, col("doc_id"), col("text"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(all == Map("apple" -> (2L, 1L), "banana" -> (4L, 3L),
      "cherry" -> (1L, 1L), "date" -> (1L, 1L)))
  }

  test("dupNgramRatio: hand-computed repetition fractions; short docs 0") {
    val df = Seq(
      "a b a b a b",        // grams: aba, bab, aba, bab -> 2/4 distinct -> 0.5
      "x x x x",            // grams: xxx, xxx -> 1/2 -> 0.5
      "one two three four", // all distinct -> 0.0
      "a b",                // shorter than n -> 0.0
      ""                    // empty -> 0.0
    ).toDF("t").select(TextAnalysis.dupNgramRatio(col("t"), 3).as("r"))
    assert(df.as[Double].collect().toSeq == Seq(0.5, 0.5, 0.0, 0.0, 0.0))
    intercept[IllegalArgumentException](TextAnalysis.dupNgramRatio(col("t"), 0))
  }

  test("bm25: single aggregate + broadcast, no per-term shuffle") {
    val docs = Seq((1L, "a b c"), (2L, "c d e")).toDF("doc_id", "text")
    val plan = graft.ext.TextRank.bm25(docs,
        TextAnalysis.tokens(col("text")), Seq("a", "c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"bm25 must not explode tokens:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stats row must broadcast:\n$plan")
  }

  test("charBigramLm/lmScore: corpus-like text outscores alien text; OOV floor applies") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the rain in spain stays mainly in the plain"),
      (3L, "every good boy does fine and the dog runs home")
    ).toDF("doc_id", "text")
    val model = TextAnalysis.charBigramLm(train, col("text"))
    // model sanity: probabilities over observed bigrams sum to 1
    val psum = model.select(sum(exp(col("logp")))).as[Double].head()
    assert(math.abs(psum - 1.0) < 1e-9)
    val probe = Seq(
      (10L, "the dog jumps over the plain"),      // corpus-like
      (11L, "zzqx vvkk wwpp qqzz xxjj zzvv kkqq") // alien bigrams -> floor
    ).toDF("doc_id", "text")
    val scores = TextAnalysis.lmScore(probe, col("doc_id"), col("text"), model)
      .as[(Long, Double)].collect().toMap
    assert(scores(10L) > scores(11L),
      s"corpus-like text must outscore alien text: $scores")
    // the alien doc's score must sit near the OOV floor
    val total = model.select(max(col("__total"))).as[Long].head().toDouble
    val floor = math.log(0.5 / total)
    assert(scores(11L) <= floor + 1.5, s"alien score ${scores(11L)} far above floor $floor")
    // doc with <2 cleaned chars is excluded, not scored as 0
    val tiny = TextAnalysis.lmScore(
      Seq((20L, "x")).toDF("doc_id", "text"), col("doc_id"), col("text"), model)
    assert(tiny.count() == 0)
  }

  test("importanceWeights: target-like docs weigh above 1, target-unlike below; matches two lmScore passes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the rain in spain stays mainly in the plain"),
      (3L, "zzqx vvkk wwpp qqzz xxjj zzvv kkqq zzxx vvqq"),
      (4L, "kkzz qqvv xxww jjpp zzkk vvxx qqjj wwzz ppvv")
    ).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") <= 2)  // English-like half
    val w = TextAnalysis.importanceWeights(docs, col("doc_id"), col("text"),
      col("doc_id") <= 2)
    val rows = w.collect().map(r => r.getLong(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // target-like docs: target model fits better than the raw model
    // (which also absorbed the alien half) -> ratio > 1; alien docs
    // are OOV under the target model -> ratio < 1
    assert(rows(1L)._3 > 1.0 && rows(2L)._3 > 1.0, s"$rows")
    assert(rows(3L)._3 < 1.0 && rows(4L)._3 < 1.0, s"$rows")
    // the fused single-explode form must equal two lmScore passes
    val mT = TextAnalysis.charBigramLm(target, col("text"))
    val mR = TextAnalysis.charBigramLm(docs, col("text"))
    val sT = TextAnalysis.lmScore(docs, col("doc_id"), col("text"), mT)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sR = TextAnalysis.lmScore(docs, col("doc_id"), col("text"), mR)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, (lt, lr, _)) =>
      assert(lt == sT(id) && lr == sR(id), s"doc $id: ($lt,$lr) vs (${sT(id)},${sR(id)})")
    }
  }

  test("phraseMatches: exact adjacency, repeated words, overlaps, case folding") {
    import spark.implicits._
    import graft.ext.TextRank
    val docs = Seq(
      (1L, "the cat sat on the mat"),            // 1 × "the cat"
      (2L, "cat the cat the cat"),                // "the cat" at 1, 3
      (3L, "the dog and a cat"),                  // words present, never adjacent
      (4L, "THE CAT shouts loudly"),              // case folds
      (5L, "nothing relevant here"))
      .toDF("doc_id", "text")
    def run(p: Seq[String]) = TextRank.phraseMatches(docs, col("doc_id"), col("text"), p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(Seq("the", "cat")) === Map(1L -> 1L, 2L -> 2L, 4L -> 1L))
    // repeated word in the phrase: "cat the cat" occurs once in doc 2
    assert(run(Seq("cat", "the", "cat")) === Map(2L -> 2L))
    // single-word phrase degenerates to a token count
    assert(run(Seq("cat"))(2L) === 3L)
    intercept[IllegalArgumentException](run(Seq.empty))
  }

  test("cooccurrencePmi: hand-computed counts and PMI; window and minCount honored") {
    import spark.implicits._
    // "a b a b", window 1: (a,b)x2, (b,a)x1; Tp=3; unigrams a=2 b=2 Tu=4
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val got = TextAnalysis.cooccurrencePmi(docs, col("doc_id"), col("text"),
        window = 1, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(("a", "b"))._1 === 2L && got(("b", "a"))._1 === 1L)
    assert(math.abs(got(("a", "b"))._2 - math.log((2.0 / 3) / (0.5 * 0.5))) < 1e-6)
    assert(math.abs(got(("b", "a"))._2 - math.log((1.0 / 3) / (0.5 * 0.5))) < 1e-6)
    // window 2 adds the skip-gram pairs (a,a) and (b,b)
    val w2 = TextAnalysis.cooccurrencePmi(docs, col("doc_id"), col("text"),
        window = 2, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(w2(("a", "a")) === 1L && w2(("b", "b")) === 1L && w2(("a", "b")) === 2L)
    // minCount prunes the singletons
    val pruned = TextAnalysis.cooccurrencePmi(docs, col("doc_id"), col("text"),
        window = 1, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned === Set(("a", "b")))
  }

  test("c4LineClean: every rule fires independently; folding precedes every check") {
    val text = Seq(
      "This line survives fine.",          // kept
      "No terminal punctuation here",      // dropped: punct
      "Too short.",                        // dropped: 2 words < 3
      "Contains the word javascript.",     // dropped: banned (folded match)
      "Code block { return x; } ends.",    // dropped: brace
      "  Spaced   But  Valid  line.  ",    // kept: normalize-then-check
      "Ends with a question?",             // kept: ? counts as terminal
      "QUOTED LINE ENDS RIGHT \""          // kept: quote terminal
    ).mkString("\n")
    val out = Seq(Tuple1(text)).toDF("t")
      .select(TextAnalysis.c4LineClean(col("t")).as("c"))
      .select(col("c.n_lines"), col("c.n_kept"), col("c.text_clean"))
      .as[(Int, Int, String)].head()
    assert(out._1 == 8 && out._2 == 4, s"got $out")
    assert(out._3.split("\n").toSeq == Seq(
      "This line survives fine.",
      "  Spaced   But  Valid  line.  ",
      "Ends with a question?",
      "QUOTED LINE ENDS RIGHT \""),
      "kept lines must keep their ORIGINAL (unfolded) text and order")
    // doc floor composes downstream: n_kept >= 3 here
    assert(out._2 >= 3)
    // minWords raised: the 4-word lines die too — only the quoted
    // line survives (5 folded tokens: the trailing quote is its own
    // whitespace-separated token)
    val strict = Seq(Tuple1(text)).toDF("t")
      .select(TextAnalysis.c4LineClean(col("t"), minWords = 5).as("c"))
      .select(col("c.n_kept")).as[Int].head()
    assert(strict == 1, "only the 5+-word survivor remains")
  }

  test("gopherQualityGate: hand-computed metrics and per-rule verdicts") {
    // 18 tokens; 2 stop words (the, with); one of four lines bulleted
    // (0.25), one ends with ellipsis (0.25); one token carries '...'
    // (1/18 = 0.0556 ≤ 0.1) and none carry '#'
    val text = Seq(
      "the cat sat with dog.",
      "- big red barn here.",
      "more words come now...",
      "final line goes here.").mkString("\n")
    val out = Seq(Tuple1(text)).toDF("t")
      .select(TextAnalysis.gopherQualityGate(col("t"), minWords = 10).as("g"))
      .select(col("g.n_words"), col("g.hash_ratio"), col("g.ellipsis_ratio"),
        col("g.bullet_frac"), col("g.ellipsis_line_frac"), col("g.n_stop"),
        col("g.passes"))
      .as[(Int, Double, Double, Double, Double, Int, Boolean)].head()
    assert(out._1 == 18, s"token count: $out")
    assert(out._2 == 0.0 && out._3 == 0.0556, s"symbol ratios: $out")
    assert(out._4 == 0.25 && out._5 == 0.25, s"line fractions: $out")
    assert(out._6 == 2 && out._7, s"stops/pass: $out")
    // violations flip their own rule only
    val bullets = (1 to 10).map(i => s"- bullet item number $i here.").mkString("\n")
    val b = Seq(Tuple1(bullets)).toDF("t")
      .select(TextAnalysis.gopherQualityGate(col("t"), minWords = 10).as("g"))
      .select(col("g.bullet_frac"), col("g.ok_bullets"), col("g.passes"))
      .as[(Double, Boolean, Boolean)].head()
    assert(b._1 == 1.0 && !b._2 && !b._3, s"all-bullet doc must fail: $b")
  }

  test("dedupParagraphsGlobal: first corpus occurrence wins across docs; claimed docs surface empty") {
    val docs = Seq(
      (1L, Seq("shared header", "unique one").mkString("\n")),
      (2L, Seq("shared header", "unique two", "unique two").mkString("\n")),
      (3L, "shared header") // every paragraph claimed by doc 1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dedupParagraphsGlobal(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2, 2, "shared header\nunique one"),
      (2L, 3, 1, "unique two"),   // header claimed by doc 1; within-doc dup also collapses
      (3L, 1, 0, "")), s"got $got")
    // partition invariance (min-struct aggregation is order-free)
    val rep = TextAnalysis.dedupParagraphsGlobal(docs.repartition(5),
        col("doc_id"), col("text"))
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect().toSeq
    assert(rep == got)
  }

  test("dedupParagraphsIncremental ≡ global recompute restricted to the increment (append-only ids)") {
    val all = Seq(
      (1L, "h one\nh two"),
      (2L, "h two\nh three"),
      (10L, "h one\ninc fresh"),          // history hit + fresh
      (11L, "inc fresh\ninc other"),      // claimed within increment + fresh
      (12L, "h three")                    // fully claimed by history
    ).toDF("doc_id", "text")
    val hist = all.filter(col("doc_id") < 10)
    val inc = all.filter(col("doc_id") >= 10)
    val incr = TextAnalysis.dedupParagraphsIncremental(hist, inc,
        col("doc_id"), col("text"))
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect().toSeq
    assert(incr == Seq(
      (10L, 2, 1, "inc fresh"),
      (11L, 2, 1, "inc other"),
      (12L, 1, 0, "")), s"got $incr")
    // the maintenance contract: ≡ full global recompute on history ∪
    // increment, restricted to increment docs
    val global = TextAnalysis.dedupParagraphsGlobal(all, col("doc_id"), col("text"))
      .filter(col("doc_id") >= 10)
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect().toSeq
    assert(incr == global, s"incremental $incr != global-restricted $global")
  }

  test("dedupLines: first occurrence wins, order preserved, counts exact") {
    val docs = Seq(
      (1L, Seq("nav bar", "body one", "nav bar", "body two", "nav bar").mkString("\n")),
      (2L, "only line"),
      (3L, Seq("x", "x", "x").mkString("\n"))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dedupLines(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 5, 3, "nav bar\nbody one\nbody two"),
      (2L, 1, 1, "only line"),
      (3L, 3, 1, "x")), s"got $got")
    // partitioning invariance (the min(pos) aggregation is order-free)
    val rep = TextAnalysis.dedupLines(docs.repartition(5), col("doc_id"), col("text"))
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect().toSeq
    assert(rep == got)
  }

  test("kAnonymize: all three levels, k-boundary, and data-null QI disambiguation") {
    import spark.implicits._
    // (a, x): 3 rows — clears k=3 at level 0
    // (a, y): 1 row  — level 0 fails, lang 'a' has 4 ≥ 3 → level 1
    // (b, z): 1 row  — lang 'b' has 2 < 3 → level 2 (full suppression)
    // (b, NULL): a DATA null QI in an undersized group — (b, NULL)
    //            has 1 < k and lang 'b' has 2 < k, so it suppresses
    //            like any small group; the null-SAFE join means it
    //            matched its own NULL-group count at every level
    //            rather than falling through unmatched. Without the
    //            grouping() markers its (b, NULL) count row would be
    //            indistinguishable from the lang-'b' rollup STRATUM
    //            row, duplicating lang=b rows through the level-1
    //            join (the 9-row assert below catches that)
    // (c, NULL): a DATA null QI whose NULL group CLEARS k — releases
    //            at level 0 with the null published as-is (the
    //            null-unsafe form wrongly suppressed these rows)
    val rows = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "x"),
      (4L, "a", "y"),
      (5L, "b", "z"), (6L, "b", null),
      (7L, "c", null), (8L, "c", null), (9L, "c", null))
      .toDF("id", "lang", "src")
    val got = graft.ext.Redact.kAnonymize(rows, col("id"),
        Seq("lang" -> col("lang"), "src" -> col("src")), k = 3L)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "a", "x", 0, 3L), (2L, "a", "x", 0, 3L), (3L, "a", "x", 0, 3L),
      (4L, "a", "*", 1, 4L),
      (5L, "*", "*", 2, 9L), (6L, "*", "*", 2, 9L),
      (7L, "c", null, 0, 3L), (8L, "c", null, 0, 3L),
      (9L, "c", null, 0, 3L)), s"got $got")
    // QI named 'id' collides with the id output column — rejected
    intercept[IllegalArgumentException] {
      graft.ext.Redact.kAnonymize(rows, col("id"),
        Seq("id" -> col("lang")), k = 3L)
    }
    // partitioning invariance: every count is one rollup aggregation
    val rep = graft.ext.Redact.kAnonymize(rows.repartition(4), col("id"),
        Seq("lang" -> col("lang"), "src" -> col("src")), k = 3L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getLong(4))).toSeq
    assert(rep == got)
  }

  test("lmBurstiness: hand-computed chunk means; uniform doc at 0; chunk boundary rule") {
    import spark.implicits._
    // model trained on "aaaa": one bigram type "aa", logp = ln(3/3) = 0,
    // OOV floor = ln(0.5/3)
    val train = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val model = TextAnalysis.charBigramLm(train, col("text"))
    val floor = math.log(0.5 / 3.0)
    // chunkSize 2: "aaaaa" → bigrams (aa,aa,aa,aa) → chunks (0,0)(1,1),
    // both mean 0 → burstiness 0. "aabb" → (aa,ab,bb) → chunk0 mean
    // (0+floor)/2, chunk1 mean floor → hand stddev. "a" → no bigrams,
    // absent from output.
    val probe = Seq((10L, "aaaaa"), (11L, "aabb"), (12L, "a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmBurstiness(probe, col("doc_id"), col("text"),
        model, chunkSize = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val c0 = (0.0 + floor) / 2
    val mean11 = (c0 + floor) / 2
    val sd11 = math.sqrt(math.pow(c0 - mean11, 2) + math.pow(floor - mean11, 2))
    assert(got.map(_._1) === Seq(10L, 11L))
    assert(got(0) === ((10L, 2L, 0.0, 0.0)))
    assert(got(1)._2 === 2L)
    assert(math.abs(got(1)._3 - r4(mean11)) < 2e-4 &&
      math.abs(got(1)._4 - r4(sd11)) < 2e-4,
      s"hand-computed chunk stats mismatch: ${got(1)} vs ($mean11, $sd11)")
  }
}
