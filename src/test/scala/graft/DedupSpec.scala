package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.functions.SimHash64

class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("shingles: distinct 3-grams, empty under k tokens") {
    val df = Seq("a b c d", "a b", "x y z x y z").toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("s"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq())
    assert(got(2).toSet == Set("x y z", "y z x", "z x y"))
  }

  test("ShingleSet expression is byte-identical to the composable form on fixture docs") {
    // real corpus + adversarial whitespace/case/short/empty rows
    val docs = graft.sources.Tables.documents(spark, sfDir).select(col("text"))
      .unionByName(Seq("", " ", "A  \t B\nC", "one two", "MiXeD Case MiXeD Case MiXeD",
        "x y z x y z",
        // unicode: accents/case folding, NBSP (  is NOT \s — stays
        // inside tokens), fullwidth letters, control char at the edge
        "Café NAÏVE straße İstanbul café",
        "a b c d e f g",
        "ctrl lead and trail x y",
        "ＡＢ ＣＤ ＥＦ Ｇ").toDF("text"))
    Seq(2, 3).foreach { k =>
      val diff = docs.select(
          Dedup.shingles(col("text"), k).as("fast"),
          Dedup.shinglesComposed(col("text"), k).as("ref"))
        .filter(not(col("fast") <=> col("ref")))
        .count()
      assert(diff == 0, s"k=$k: $diff rows differ between ShingleSet and composed form")
    }
  }

  test("jaccard: identical=1, disjoint=0") {
    val df = Seq((Seq("a", "b"), Seq("a", "b")), (Seq("a"), Seq("b")))
      .toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y")).as("j"))
    assert(df.as[Double].collect().toSeq == Seq(1.0, 0.0))
  }

  test("minhash of identical shingle sets is equal") {
    val df = Seq("p q r s t", "p q r s t", "zz yy xx ww vv").toDF("t")
      .select(Dedup.minhash(Dedup.shingles(col("t"), 3), 0).as("h"))
    val hs = df.as[String].collect()
    assert(hs(0) == hs(1) && hs(0) != hs(2))
  }

  test("simhash64: identical tokens equal; near docs within small hamming") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tonight")
    val far = "completely different words about database engines and shuffles here"
    val df = Seq(base, base, near, far).toDF("t")
      .select(SimHash64.simhash64(split(col("t"), " ")).as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) == hs(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(2)) < ham(hs(0), hs(3)),
      s"near ${ham(hs(0), hs(2))} !< far ${ham(hs(0), hs(3))}")
  }

  test("minhash near-dup pipeline finds planted pairs on sf0.001") {
    val docs = sources.Tables.documents(spark, sfDir)
    val pairs = Dedup.nearDupPairs(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty, "expected planted near-dup pairs")
    assert(pairs.forall(_._3 >= 0.8))
  }

  test("simhash pipeline agrees with minhash on high-sim pairs") {
    val docs = sources.Tables.documents(spark, sfDir)
    val mh = Dedup.nearDupPairs(docs, col("doc_id"), col("text"), threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sh = Dedup.simhashNearDup(docs, col("doc_id"), col("text"), maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // SimHash is an approximation — require substantial overlap, not equality.
    val overlap = mh.intersect(sh).size.toDouble / math.max(1, mh.size)
    assert(overlap >= 0.6, s"simhash recall vs minhash: $overlap (mh=${mh.size}, sh=${sh.size})")
  }

  test("winnow fingerprints: identical texts match; shared substrings overlap") {
    import graft.functions.Winnow
    val long = "the quick brown fox jumps over the lazy dog while the cat sleeps"
    val containing = "PREFIX " + long + " SUFFIX"
    val other = "completely unrelated content about database engines and columns"
    val df = Seq(long, long, containing, other).toDF("t")
      .select(Winnow.winnow(col("t"), 8, 4).as("f"))
    val fps = df.as[Seq[Long]].collect()
    assert(fps(0) == fps(1))
    // containment: most of the contained text's fingerprints survive
    val overlap = fps(0).toSet.intersect(fps(2).toSet).size.toDouble / fps(0).size
    assert(overlap >= 0.7, s"containment overlap $overlap")
    assert(fps(0).toSet.intersect(fps(3).toSet).size <= 1)
    // short text → null
    val short = Seq("abc").toDF("t").select(Winnow.winnow(col("t"), 8, 4).as("f"))
    assert(short.collect().head.isNullAt(0))
  }

  test("winnow near-dup pipeline finds the planted pairs") {
    val docs = sources.Tables.documents(spark, sfDir)
    val win = Dedup.winnowNearDup(docs, col("doc_id"), col("text"),
        k = 24, w = 8, minShared = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mh = Dedup.nearDupPairs(docs, col("doc_id"), col("text"), threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(win.nonEmpty)
    val recall = mh.intersect(win).size.toDouble / math.max(1, mh.size)
    assert(recall >= 0.8, s"winnow recall vs minhash: $recall (${win.size} vs ${mh.size})")
  }

  test("dupClusters: transitive chains collapse to min-id components") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = ext.Dedup.dupClusters(pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("dupClustersContracted ≡ dupClusters: hand case, and the fixture near-dup graph") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = ext.Dedup.dupClustersContracted(pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val realPairs = ext.Dedup.nearDupPairs(docs, col("doc_id"), col("text"))
      .localCheckpoint()
    val prop = ext.Dedup.dupClusters(realPairs)
    val contr = ext.Dedup.dupClustersContracted(realPairs)
    assert(contr.except(prop).isEmpty && prop.except(contr).isEmpty,
      "contraction and propagation disagree on the fixture graph")
  }

  test("dupClustersContracted handles an adversarially long chain in O(log^2) rounds") {
    // a 300-link path: component diameter 300 — min-label propagation
    // needs ~300 rounds (its maxIters guard fires), contraction a
    // handful; this is exactly the failure mode the scale path exists
    // for
    val n = 300
    val chain = (1 until n).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      ext.Dedup.dupClusters(chain, maxIters = 5)
    }
    val got = ext.Dedup.dupClustersContracted(chain, maxIters = 20)
      .as[(Long, Long, Long)].collect()
    assert(got.length == n && got.forall { case (_, c, s) => c == 1L && s == n.toLong })
    // reversed/duplicated/self-loop edges change nothing
    val messy = chain.unionByName(
      Seq((5L, 4L), (7L, 7L), (2L, 1L)).toDF("id_a", "id_b"))
    val got2 = ext.Dedup.dupClustersContracted(messy, maxIters = 20)
      .as[(Long, Long, Long)].collect()
    assert(got2.toSet == got.toSet)
  }

  test("rowsPerBandForThreshold: S-curve inflection picks the hand-computed geometry") {
    // n=8, inflections: r=1→0.125, r=2→0.5, r=4→0.841, r=8→1.0
    assert(ext.Dedup.rowsPerBandForThreshold(0.8, 8) == 4)
    assert(ext.Dedup.rowsPerBandForThreshold(0.5, 8) == 2)
    assert(ext.Dedup.rowsPerBandForThreshold(0.15, 8) == 1)
    assert(ext.Dedup.rowsPerBandForThreshold(0.95, 8) == 8)
    // ties prefer more bands (smaller r = higher recall)
    assert(ext.Dedup.rowsPerBandForThreshold(0.3125, 8) == 1)
    // non-power-of-two signatures use real divisors
    assert(ext.Dedup.rowsPerBandForThreshold(0.6, 12) == 3) // (1/4)^(1/3)=0.63
  }

  test("bandingForRecall: S-curve inversion meets the recall target, hand-checked picks") {
    def recallAt(s: Double, n: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, r), n / r)
    // the q239 operating point: t=0.5, target 0.95 → 11 bands × 2 rows
    assert(ext.Dedup.bandingForRecall(0.5, 0.95) == (22, 2))
    assert(recallAt(0.5, 22, 2) >= 0.95)
    // every derived geometry meets its target AT the threshold, for a
    // grid of operating points; and strictly exceeds it above it
    for (t <- Seq(0.3, 0.5, 0.7, 0.8, 0.9); rho <- Seq(0.9, 0.95, 0.99)) {
      val (n, r) = ext.Dedup.bandingForRecall(t, rho)
      assert(n % r == 0 && n <= 64, s"($n, $r) at t=$t rho=$rho")
      assert(recallAt(t, n, r) >= rho,
        s"recall ${recallAt(t, n, r)} < $rho at t=$t, geometry ($n, $r)")
      assert(recallAt(math.min(1.0, t + 0.1), n, r) >= recallAt(t, n, r),
        "S-curve must be non-decreasing in similarity")
    }
    // precision choice: at (0.8, 0.9) the pick must beat r=1's noise
    // collision rate (r=1 would flood candidates: any shared minhash)
    val (n08, r08) = ext.Dedup.bandingForRecall(0.8, 0.9)
    assert(r08 > 1, s"picked r=$r08 — r=1 floods candidates")
    val noise = 1.0 - math.pow(1.0 - math.pow(0.4, r08), n08 / r08)
    val noiseR1 = 1.0 - math.pow(1.0 - 0.4, math.ceil(
      math.log1p(-0.9) / math.log1p(-0.8)))
    assert(noise < noiseR1, "pick must be more precise than the r=1 form")
    // infeasible: recall 0.999 at t=0.1 needs > 64 hashes
    intercept[IllegalArgumentException] {
      ext.Dedup.bandingForRecall(0.1, 0.999, maxHashes = 64)
    }
  }

  test("nearDupPairsForRecall: deployed auto form ≡ nearDupPairs at the derived geometry") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the wrapper must ride EXACTLY the geometry bandingForRecall
    // derives — q239's operating point (0.5, 0.95) → 22 hashes × 2 rows
    val auto = ext.Dedup.nearDupPairsForRecall(
      docs, col("doc_id"), col("text"), threshold = 0.5, targetRecall = 0.95)
    val explicit = ext.Dedup.nearDupPairs(
      docs, col("doc_id"), col("text"),
      numHashes = 22, rowsPerBand = 2, threshold = 0.5)
    val a = auto.collect().toSeq
    val e = explicit.collect().toSeq
    assert(a == e, s"auto form diverged from explicit (22, 2): " +
      s"${a.size} vs ${e.size} rows")
    assert(a.nonEmpty, "fixture must produce near-dup pairs at t=0.5")
    // and it must be a superset of the fixed 8×2 default's pairs at
    // the same threshold (more bands can only ADD candidates; the
    // exact-Jaccard verify keeps precision)
    val fixed = ext.Dedup.nearDupPairs(
      docs, col("doc_id"), col("text"), threshold = 0.5)
      .select(col("id_a"), col("id_b")).collect().toSet
    val autoKeys = auto.select(col("id_a"), col("id_b")).collect().toSet
    assert(fixed.subsetOf(autoKeys),
      s"auto recall regressed vs the fixed default: missing ${fixed -- autoKeys}")
  }

  test("setSimJoinExact ≡ naive all-pairs join (completeness), and catches LSH misses by construction") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = ext.Dedup.setSimJoinExact(docs, col("doc_id"), col("text"), 0.8)
    // naive reference: brute-force over the same shingle sets
    val sh = docs.select(col("doc_id").as("id"),
        graft.ext.Dedup.shingles(col("text"), 3).as("ts"))
      .filter(size(col("ts")) > 0)
    val a = sh.select(col("id").as("id_a"), col("ts").as("ta"))
    val b = sh.select(col("id").as("id_b"), col("ts").as("tb"))
    val inter = size(array_intersect(col("ta"), col("tb"))).cast("double")
    val naive = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (inter / (size(col("ta")) + size(col("tb")) - inter)).as("__j"))
      .filter(col("__j") >= 0.8)
      .select(col("id_a"), col("id_b"), round(col("__j"), 4).as("jaccard"))
    assert(exact.except(naive).isEmpty && naive.except(exact).isEmpty,
      "prefix filtering lost or fabricated a pair")
    // the subset relation with LSH: every minhash-banded pair at the
    // same threshold is in the exact set (the reverse need not hold)
    val lsh = ext.Dedup.nearDupPairs(docs, col("doc_id"), col("text"), threshold = 0.8)
      .select("id_a", "id_b")
    assert(lsh.except(exact.select("id_a", "id_b")).isEmpty,
      "LSH emitted a pair the exact join does not confirm")
  }

  test("setSimJoinExact: over-cap prefix bucket fails loudly, not silently incomplete") {
    import spark.implicits._
    val same = (1L to 30L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      ext.Dedup.setSimJoinExact(same, col("doc_id"), col("text"), 0.8,
        maxBucket = 10).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("completeness") || m.contains("exceeds maxBucket")),
      s"expected the loud completeness failure, got: ${messages(e).take(3)}")
  }

  test("containmentPairs finds quote-inclusion that Jaccard misses") {
    val small = "the quick brown fox jumps over the lazy dog tonight"
    val big = ("unrelated preamble text goes here first with many words " * 3) +
      small + (" and then a long unrelated continuation follows afterwards " * 3)
    val docs = Seq((1L, small), (2L, big), (3L, "completely different content on other topics"))
      .toDF("doc_id", "text")
    val got = ext.Dedup.containmentPairs(docs, col("doc_id"), col("text"),
        threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(got.exists { case (s, b, c) => s == 1L && b == 2L && c >= 0.8 },
      s"containment pair missing: ${got.toSeq}")
    // but the Jaccard pipeline does NOT pair them at 0.8
    val jac = ext.Dedup.nearDupPairs(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect()
    assert(!jac.exists { case (a, b, _) => a == 1L && b == 2L })
  }

  test("contaminationPairs: exact overlap counts, fraction, cap and minOverlap") {
    // test doc 10 is fully contained in train doc 1; doc 12 shares a
    // 4-word phrase with doc 1 (2 trigrams); doc 14 is clean
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different training content about other things")
    ).toDF("doc_id", "text")
    val test = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // contained: 6 of 6
      (12L, "unrelated words then beta gamma delta epsilon here"), // 2 shared trigrams
      (14L, "nothing in common with anything above at all")
    ).toDF("doc_id", "text")
    val got = ext.Dedup.contaminationPairs(train, test, col("doc_id"), col("text"),
        k = 3, minOverlap = 1)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got.contains((10L, 1L, 6L, 1.0)), s"full containment missing: $got")
    assert(got.exists { case (t, tr, n, f) => t == 12L && tr == 1L && n == 2L },
      s"partial overlap missing: $got")
    assert(!got.exists(_._1 == 14L), "clean doc flagged")
    // minOverlap filters the partial pair out
    val strict = ext.Dedup.contaminationPairs(train, test, col("doc_id"), col("text"),
        k = 3, minOverlap = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(strict.map(r => (r._1, r._2)) == Set((10L, 1L)))
    // a doc-frequency cap of 0 drops every shingle -> no pairs
    val capped = ext.Dedup.contaminationPairs(train, test, col("doc_id"), col("text"),
        k = 3, minOverlap = 1, maxDocsPerShingle = 0)
      .collect()
    assert(capped.isEmpty)
  }

  test("contaminationPairs bloom-pruned form is byte-identical to the unpruned screen") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val test10 = docs.filter(col("doc_id") % 2 === 1)
    val plain = ext.Dedup.contaminationPairs(train, test10,
      col("doc_id"), col("text"), k = 3, minOverlap = 3)
    val bloomed = ext.Dedup.contaminationPairs(train, test10,
      col("doc_id"), col("text"), k = 3, minOverlap = 3, bloomPruneTrain = true)
    assert(plain.except(bloomed).isEmpty && bloomed.except(plain).isEmpty)
    assert(plain.count() > 0, "fixture slice should produce contamination pairs")
    // the probe is a scan-side predicate: BloomFilterMightContain sits
    // in a Filter, never behind an exchange
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"),
      s"expected the bloom probe in the plan:\n$plan")
  }

  test("exactDedup keeps min ordinal per key") {
    val df = Seq(("k1", 5L), ("k1", 2L), ("k2", 9L)).toDF("k", "id")
    val got = Dedup.exactDedup(df, Seq(col("k")), col("id"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("k1", 2L, 2L), ("k2", 9L, 1L)))
  }

  test("hammingClusters: mass duplicates collapse before banding; closure matches brute force") {
    // 30 ids over THREE distinct sigs: A and B near (hamming 1), C far
    // — the pair form would emit 10·9/2 pairs per duplicated sig plus
    // 10·10 cross pairs; the cluster form's pair stage sees 3 rows.
    val A = 0x0f0f0f0f0f0f0f0fL
    val B = A ^ 1L                 // hamming(A,B) = 1
    val C = ~A                     // hamming(A,C) = 64
    val sigs = ((0L until 10L).map((_, A)) ++ (10L until 20L).map((_, B)) ++
      (20L until 30L).map((_, C))).toDF("id", "sig")
    val got = Dedup.hammingClusters(sigs, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val want = ((0L until 20L).map((_, 0L, 20L)) ++
      (20L until 30L).map((_, 20L, 10L))).toSet
    assert(got == want, s"clusters wrong:\n got $got\n want $want")
    // an isolated singleton keeps its own id as cluster of size 1
    val solo = Dedup.hammingClusters(Seq((7L, 0x1234L)).toDF("id", "sig"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(solo == Seq((7L, 7L, 1L)))
  }

  test("removeRepeatedSpans: cross-doc and within-doc k-windows, short docs kept whole") {
    // k=3, minDf=2. d1/d2 share the 4-token run "a b c d" (two repeated
    // 3-windows covering 4 positions in each); d3 is unique; d4 is
    // shorter than k; d5 repeats its only window WITHIN the doc (df=2
    // by occurrence count) so it empties out entirely.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y z a b c d q"),
      (3L, "u v w"),
      (4L, "p q"),
      (5L, "m m m m")
    ).toDF("doc_id", "text")
    val got = Dedup.removeRepeatedSpans(docs, col("doc_id"), col("text"),
        k = 3, minDf = 2)
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 6, 4, "e f"),        // cov {0,1,2,3} from windows at pos 0,1
      (2L, 8, 4, "x y z q"),    // cov {3,4,5,6}
      (3L, 3, 0, "u v w"),
      (4L, 2, 0, "p q"),        // < k tokens: no windows, passes through
      (5L, 4, 4, "")            // within-doc repetition empties the doc
    ), s"got $got")
    // minDf above every window's occurrence count removes nothing
    val none = Dedup.removeRepeatedSpans(docs, col("doc_id"), col("text"),
        k = 3, minDf = 3)
      .agg(sum(col("n_removed"))).as[Long].head()
    assert(none == 0L)
  }

  test("maximalRepeatedSpans: planted cross-doc spans come back maximal, bounded, and q97-consistent") {
    // minLen=3, minDf=2. d1/d2 share TWO disjoint repeated runs — the
    // 4-token "a b c d" and the 3-token "r s t" — separated by unique
    // filler, so each doc must report exactly two MAXIMAL spans (not
    // one merged, not the individual overlapping 3-windows). d3's
    // 2-token overlap with d1 ("a b") is below minLen → no span.
    val docs = Seq(
      (1L, "a b c d u1 u2 r s t"),
      (2L, "v1 a b c d v2 v3 r s t v4"),
      (3L, "a b w1 w2 w3")
    ).toDF("doc_id", "text")
    val got = Dedup.maximalRepeatedSpans(docs, col("doc_id"), col("text"),
        minLen = 3, minDf = 2)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    def md5s(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(got == Seq(
      (1L, 0, 3, 4, md5s("a b c d")),
      (1L, 6, 8, 3, md5s("r s t")),
      (2L, 1, 4, 4, md5s("a b c d")),
      (2L, 7, 9, 3, md5s("r s t"))
    ), s"got $got")
    // every span at least minLen, and the span-position union equals
    // q97's covered set (same k) — the documented equivalence
    assert(got.forall(_._4 >= 3))
    val bySpan = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val byQ97 = Dedup.removeRepeatedSpans(docs, col("doc_id"), col("text"),
        k = 3, minDf = 2)
      .filter(col("n_removed") > 0)
      .select(col("doc_id"), col("n_removed"))
      .as[(Long, Int)].collect().toMap
    assert(bySpan == byQ97, s"span union $bySpan != q97 covered $byQ97")
  }

  test("exactSubstrDedup: first occurrence keeps, every later copy strips (vs q97 deleting all)") {
    // same fixture as the span test: the winner of each repeated span
    // content is its (doc_id, span_start)-minimal occurrence — d1
    // keeps both planted runs intact, d2 loses exactly those token
    // positions, d3 (sub-minLen overlap) is untouched
    val docs = Seq(
      (1L, "a b c d u1 u2 r s t"),
      (2L, "v1 a b c d v2 v3 r s t v4"),
      (3L, "a b w1 w2 w3")
    ).toDF("doc_id", "text")
    val got = Dedup.exactSubstrDedup(docs, col("doc_id"), col("text"),
        minLen = 3, minDf = 2)
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 9, 0, "a b c d u1 u2 r s t"),
      (2L, 11, 7, "v1 v2 v3 v4"),
      (3L, 5, 0, "a b w1 w2 w3")
    ), s"got $got")
    // the q97 contrast: remove-ALL-copies strips d1 too
    val all97 = Dedup.removeRepeatedSpans(docs, col("doc_id"), col("text"),
        k = 3, minDf = 2)
      .filter(col("doc_id") === 1L).select(col("n_removed"))
      .as[Int].head()
    assert(all97 == 7, s"q97 should strip d1's 7 covered positions, got $all97")
  }

  test("incrementalNearDup: history match flags, earlier-incoming match flags, clean passes") {
    import spark.implicits._
    val base = (1 to 8).map(i =>
      s"section $i the quick brown fox jumps over the lazy dog by the river bank").mkString(" ")
    val other = (1 to 8).map(i =>
      s"entry $i parquet files stripe their columns into pages with dictionaries and statistics").mkString(" ")
    val history = Seq(10L -> base).toDF("doc_id", "text")
    val incoming = Seq(
      21L -> base.replaceFirst("lazy", "hazy"),      // near-dups history
      23L -> other,                                  // fresh content
      25L -> other.replaceFirst("pages", "cages"))   // near-dups EARLIER incoming 23
      .toDF("doc_id", "text")
    val got = graft.ext.Dedup.incrementalNearDup(history, incoming,
        col("doc_id"), col("text"), maxHamming = 20)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(21L -> true, 23L -> false, 25L -> true), s"$got")
    // empty history: only the min-id rule applies
    val noHist = graft.ext.Dedup.incrementalNearDup(
        history.limit(0), incoming, col("doc_id"), col("text"), maxHamming = 20)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(noHist === Map(21L -> false, 23L -> false, 25L -> true), s"$noHist")
  }

  test("editVerifiedPairs: small edits kept, shingle-similar but edit-distant pairs verified away") {
    import spark.implicits._
    // long base: one substituted word changes only ~3 of ~100
    // shingles, so the simhash stays band-identical and the pair is
    // a guaranteed banding candidate
    val base = (1 to 8).map(i =>
      s"chapter $i the quick brown fox jumps over the lazy dog by the river bank").mkString(" ")
    val docs = Seq(
      1L -> base,
      2L -> base.replaceFirst("lazy", "hazy"),       // 1-char edit
      // same opening shingles, long divergent tail -> candidate via
      // banding but FAR in edit distance
      3L -> (base + " and then it wandered through seventeen additional unrelated paragraphs of text about completely different topics entirely"),
      4L -> "totally unrelated content with no shared vocabulary whatsoever here")
      .toDF("doc_id", "text")
    val pairs = graft.ext.Dedup.editVerifiedPairs(docs, col("doc_id"), col("text"),
        maxHamming = 20, maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)),
      s"expected only the 1-edit pair, got $pairs")
    assert(pairs.head._3 === 1, s"edit distance must be exactly 1: $pairs")
    // with a generous maxDist the tail-divergent doc is admitted as a
    // candidate pair too; the unrelated doc never pairs with anything
    val loose = graft.ext.Dedup.editVerifiedPairs(docs, col("doc_id"), col("text"),
        maxHamming = 20, maxDist = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.exists(p => p._1 == 3L || p._2 == 3L), s"tail doc never paired: $loose")
    assert(!loose.exists(p => p._1 == 4L || p._2 == 4L), s"unrelated doc paired: $loose")
  }

  test("lcsLen matches the classic DP on random sequences and edges") {
    import spark.implicits._
    def refLcs(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) =
          if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val rng = new scala.util.Random(20260814L)
    val alphabet = Vector("a", "b", "c", "d")
    val cases = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b"), Seq.empty[String]),
      (Seq("q"), Seq("r")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("a", "a", "b"), Seq("a", "b", "a"))) ++
      (1 to 40).map { _ =>
        (Seq.fill(rng.nextInt(12))(alphabet(rng.nextInt(4))),
         Seq.fill(rng.nextInt(12))(alphabet(rng.nextInt(4))))
      }
    val got = cases.toDF("a", "b")
      .select(Dedup.lcsLen(col("a"), col("b")).as("l"))
      .as[Int].collect().toSeq
    val want = cases.map { case (a, b) => refLcs(a, b) }
    assert(got == want, s"lcsLen mismatch:\n got=$got\nwant=$want")
  }

  test("rougeVerifiedPairs: order sensitivity — swapped words score below the identical pair") {
    import spark.implicits._
    val base = (1 to 8).map(i =>
      s"step $i mix the flour and water then knead the dough gently").mkString(" ")
    // swap two adjacent words once: same bag of words, different
    // order — nearly all shingles survive so it stays a banding
    // candidate, but LCS (order-sensitive) drops below 1
    val swapped = base.replaceFirst("the flour", "flour the")
    val docs = Seq(1L -> base, 2L -> base, 3L -> swapped).toDF("doc_id", "text")
    val got = graft.ext.Dedup.rougeVerifiedPairs(docs, col("doc_id"), col("text"),
        maxHamming = 32, maxTokens = 40, minRouge = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    assert(got((1L, 2L)) == 1.0, s"identical pair must score 1.0: $got")
    assert(got.contains((1L, 3L)) && got((1L, 3L)) < 1.0,
      s"swapped pair must be a candidate scoring < 1: $got")
    // Jaccard over the same word sets would be 1.0 for (1,3) — the
    // LCS penalty is what ROUGE-L adds
    assert(got((1L, 3L)) > 0.7, s"swap penalty should be mild: $got")
  }
}
