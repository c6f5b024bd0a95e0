package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Agg, Match, Score, Text}

/** Property-based invariants (SURVEY.md §5.3): the algebraic facts the
  * reference's behavior implies, checked over scalacheck-generated
  * inputs (driven directly through Gen — the scalatest bridge artifact
  * isn't on the offline classpath).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val textGen = Gen.listOf(Gen.oneOf(wordGen, Gen.const("  "), Gen.const("\t")))
    .map(_.mkString(" "))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("packSequences invariants over random counts and capacities") {
    val countsGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 400L))
    val capGen = Gen.chooseNum(1L, 64L)
    for (i <- 0 until 8) {
      val counts = samples(countsGen, 1).head
      val cap = samples(capGen, 1).headOption.getOrElse(16L)
      val df = counts.zipWithIndex.map { case (c, idx) => (idx.toLong, c) }
        .toDF("id", "n_toks")
      val packed = graft.ops.Packing.packSequences(df, Seq(col("id")), "n_toks", cap,
          numPartitions = Some(1 + i % 4))
        .select("id", "n_toks", "tok_start", "seq_first", "seq_last", "n_seqs")
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      val kept = counts.zipWithIndex.filter(_._1 > 0)
      assert(packed.length == kept.size)
      // gapless stream in id order: each start = previous end
      var expectStart = 0L
      packed.foreach { case (_, n, start, first, last, nseq) =>
        assert(start == expectStart, s"gap at start=$start expected=$expectStart")
        assert(first == start / cap)
        assert(last == (start + n - 1) / cap)
        assert(nseq == last - first + 1 && nseq >= 1)
        // worst case starts at offset cap-1 within a sequence:
        // spans = floor((cap-1 + n-1)/cap) + 1
        assert(nseq <= (n + cap - 2) / cap + 1, "span exceeds worst-case bound")
        expectStart = start + n
      }
      assert(expectStart == kept.map(_._1).sum, "token conservation")
    }
  }

  test("X1 clean is idempotent and never longer") {
    val texts = samples(textGen, 60)
    val df = texts.toDF("t").select(
      Text.cleanText(col("t")).as("c1"),
      Text.cleanText(Text.cleanText(col("t"))).as("c2"),
      length(col("t")).as("lt"), length(Text.cleanText(col("t"))).as("lc"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(r.getInt(3) <= r.getInt(2))
    }
  }

  test("Html.stripTags on tag-free entity-free text ≡ whitespace collapse; idempotent on its own output") {
    val texts = samples(textGen, 60)
    val df = texts.toDF("t").select(
      graft.ext.Html.stripTags(col("t")).as("h"),
      trim(regexp_replace(col("t"), "\\s+", " ")).as("w"),
      graft.ext.Html.stripTags(graft.ext.Html.stripTags(col("t"))).as("hh"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1))  // no markup → pure collapse
      assert(r.getString(0) == r.getString(2))  // idempotent on clean text
    }
  }

  test("Html.stripTags strips any generated tag soup down to the visible words") {
    val tagGen = Gen.oneOf("p", "div", "span", "b", "i", "h1")
    val docGen = for {
      words <- Gen.nonEmptyListOf(wordGen)
      tags  <- Gen.listOfN(words.length, tagGen)
      close <- Gen.listOfN(words.length, Gen.oneOf(true, false))
    } yield {
      val html = words.zip(tags.zip(close)).map { case (w, (t, c)) =>
        if (c) s"<$t>$w</$t>" else s"<$t attr='1'>$w"
      }.mkString(" ")
      (html, words.mkString(" "))
    }
    val docs = samples(docGen, 60)
    val got = docs.map(_._1).toDF("h")
      .select(graft.ext.Html.stripTags(col("h"))).as[String].collect()
    got.zip(docs.map(_._2)).foreach { case (g, want) => assert(g == want) }
  }

  test("A3 matched keywords are a subset of the keyword list, lowercased") {
    val kwSets = samples(Gen.nonEmptyListOf(wordGen).map(_.distinct.take(5)), 10)
    val texts = samples(textGen, 30)
    kwSets.foreach { kws =>
      val got = texts.toDF("t")
        .select(Match.matchedKeywords(col("t"), kws).as("m"))
        .as[Seq[String]].collect()
      val lower = kws.map(_.toLowerCase).toSet
      got.foreach(m => assert(m.toSet.subsetOf(lower)))
    }
  }

  test("X10 score is additive over every channel subset and bounded 0..6") {
    val channels = Seq(Score.FoundViaDirect, Score.FoundViaPost, Score.FoundViaComment)
    val subsets = (0 to 7).map(mask => channels.zipWithIndex.collect {
      case (c, i) if (mask & (1 << i)) != 0 => c
    })
    val scores = subsets.toDF("via")
      .select(Score.relevanceScore(col("via")).as("s")).as[Int].collect()
    subsets.zip(scores).foreach { case (sub, s) =>
      val expected = sub.map {
        case Score.FoundViaDirect => 1
        case Score.FoundViaPost => 2
        case Score.FoundViaComment => 3
      }.sum
      assert(s == expected && s >= 0 && s <= 6)
    }
  }

  test("union conserves row counts; dedup is idempotent") {
    samples(Gen.nonEmptyListOf(Gen.choose(0, 5)), 10).foreach { xs =>
      val df = xs.toDF("v")
      assert(df.unionByName(df).count() == 2L * xs.length)
      val d1 = Agg.dedupFirstWins(df, col("v"), col("v"), Nil)
      val d2 = Agg.dedupFirstWins(d1.select(col("v")), col("v"), col("v"), Nil)
      assert(d1.count() == d2.count() && d1.count() == xs.distinct.length)
    }
  }

  test("minhash depends only on the shingle set") {
    samples(Gen.listOfN(12, wordGen), 10).filter(_.size >= 3).foreach { words =>
      val t = words.mkString(" ")
      val hs = Seq(t, t).toDF("t")
        .select(ext.Dedup.minhash(ext.Dedup.shingles(col("t"), 3), 1).as("h"))
        .as[String].collect()
      assert(hs(0) == hs(1))
    }
  }

  test("nearDupPairs equals the naive all-pairs Jaccard filter on random corpora") {
    // the LSH pipeline with bands covering the full signature (1 band
    // of 2 rows would miss pairs; 8 bands of 1 row catches any pair
    // sharing ANY minhash — with threshold filtering after, the result
    // must be a SUBSET of naive; with threshold high and docs drawn
    // from a tiny vocab, verify the exact-verify stage agrees with the
    // naive jaccard on every emitted pair
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps")
    val docGen = Gen.listOfN(8, Gen.oneOf(vocab)).map(_.mkString(" "))
    val docs = samples(docGen, 24).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    val got = ext.Dedup.nearDupPairs(df, col("id"), col("text"),
        numHashes = 8, rowsPerBand = 1, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // naive reference: distinct 3-gram shingles + exact jaccard
    def sh(t: String): Set[String] = {
      val w = t.trim.toLowerCase.split("\\s+").toSeq
      if (w.size < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val naive = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      sa = sh(ta); sb = sh(tb) if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      jr = BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= 0.5
    } yield (a, b) -> jr).toMap
    // every LSH pair must be a true near-pair with the same jaccard
    got.foreach { case (k, j) => assert(naive.get(k).contains(j), s"$k -> $j") }
    // recall: 1-row bands catch a pair iff it agrees on ≥1 of the 8
    // minhashes — probability 1-(1-j)^8 ≥ 0.996 at j ≥ 0.5, NOT
    // guaranteed (a shared shingle need not be any hash's argmin).
    // Inputs are seed-pinned, so assert a high floor rather than
    // exactness to stay robust to generator changes.
    assert(got.keySet.subsetOf(naive.keySet))
    if (naive.nonEmpty) {
      val recall = got.size.toDouble / naive.size
      assert(recall >= 0.9,
        s"recall $recall; missed: ${naive.keySet -- got.keySet}")
    }
  }

  test("simhashNearDup hamming matches direct signature XOR popcount") {
    val vocab = Seq("red", "blue", "green", "gold")
    val docGen = Gen.listOfN(10, Gen.oneOf(vocab)).map(_.mkString(" "))
    val docs = samples(docGen, 20).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    val sigs = df.select(col("id"),
        functions.SimHash64.simhash64(ext.Dedup.shingles(col("text"), 3)).as("sig"))
      .as[(Long, Long)].collect().toMap
    val got = ext.Dedup.simhashNearDup(df, col("id"), col("text"), maxHamming = 64)
      .as[(Long, Long, Int)].collect()
    got.foreach { case (a, b, h) =>
      assert(java.lang.Long.bitCount(sigs(a) ^ sigs(b)) == h)
    }
  }

  test("X13 timeFilter spans nest: day ⊆ week ⊆ month ⊆ year ⊆ all") {
    val now = lit("2024-06-15 12:00:00").cast("timestamp")
    val tsGen = Gen.choose(0L, 5L * 365 * 86400).map(off =>
      new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-06-15 12:00:00").getTime - off * 1000))
    val df = samples(tsGen, 80).toDF("ts")
    val counts = Seq("day", "week", "month", "year", "all").map(f =>
      df.filter(ops.Time.timeFilter(col("ts"), f, now)).count())
    assert(counts == counts.sorted, s"not nested: $counts")
  }

  test("applyChanges equals the naive LWW reference on random changesets") {
    // (key, name-ish payload, seq, op, chg_id) with colliding keys and
    // tied seqs so compaction and tie-break both matter
    val changeGen = for {
      k <- Gen.choose(0L, 15L)
      p <- Gen.choose(0, 99)
      seq <- Gen.choose(0L, 5L)
      op <- Gen.oneOf("I", "U", "D")
    } yield (k, s"p$p", seq, op)
    val caseGen = Gen.listOfN(40, changeGen)

    samples(caseGen, 8).zipWithIndex.foreach { case (chs0, ci) =>
      val chs = chs0.zipWithIndex.map { case ((k, p, seq, op), i) =>
        (k, p, seq, op, i.toLong) // unique chg_id
      }
      val snapshot = (0L to 9L).map(k => (k, s"orig$k")).toDF("k", "name")
      val changes = chs.toDF("k", "name", "seq", "op", "chg_id")
      val got = graft.ops.Merge.applyChanges(snapshot, changes, "k", "seq", "op", "chg_id")
        .as[(Long, String)].collect().toMap

      val latest = chs.groupBy(_._1).view.mapValues(_.maxBy(c => (c._3, c._5))).toMap
      val naive = ((0L to 9L).map(k => k -> s"orig$k").toMap ++
        latest.collect { case (k, (_, p, _, op, _)) if op != "D" => k -> p })
        .removedAll(latest.collect { case (k, (_, _, _, "D", _)) => k })
      assert(got == naive, s"case $ci: $got vs $naive")
    }
  }
}
