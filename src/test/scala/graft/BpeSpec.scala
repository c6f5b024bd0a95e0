package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed merges: counts, ASCII tie-breaks, early stop") {
    // corpus "aa aa ab": freqs aa=2, ab=1
    // s0 pairs: (a,a)=2, (a,_)=2, (a,b)=1, (b,_)=1
    //   tie at 2 → right tie-break: '_'(0x5F) < 'a' → merge (a,_)
    // then (a,a_)=2; then ties at 1 → (a,b) before (b,_); then (ab,_)
    // 5th iteration finds no pairs → stops at 4 merges
    val wf = Seq(("aa", 2L), ("ab", 1L)).toDF("word", "freq")
    val merges = Bpe.learnMerges(wf, 8)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1, "a", "_", 2L), (2, "a", "a_", 2L), (3, "a", "b", 1L), (4, "ab", "_", 1L)))
  }

  test("overlapping pair occurrences all count; merge applies left-to-right") {
    // "aaa": [a,a,a,_] → (a,a) counts twice (get_stats), merge yields [aa,a,_]
    val wf = Seq(("aaa", 1L)).toDF("word", "freq")
    val merges = Bpe.learnMerges(wf, 8)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1, "a", "a", 2L), (2, "a", "_", 1L), (3, "aa", "a_", 1L)))
  }

  test("applyMerges (encode) reproduces the fitted vocabulary symbols") {
    val wf = Seq(("aa", 2L), ("ab", 1L)).toDF("word", "freq")
    val merges = Bpe.learnMerges(wf, 8)
      .orderBy("merge_rank")
      .select("sym_left", "sym_right").as[(String, String)].collect().toSeq
    val enc = Seq("aa", "ab", "aab").toDF("word")
      .select(col("word"), Bpe.applyMerges(col("word"), merges).as("sym"))
      .as[(String, String)].collect().toMap
    assert(enc("aa") == "<aa_>")
    assert(enc("ab") == "<ab_>")
    // unseen word: merges apply greedily left-to-right — "aab" gets
    // (a,_)? no: [a,a,b,_] → (a,_) absent; (a,a_) absent; (a,b) → [a,ab,_];
    // (ab,_) → [a,ab_]
    assert(enc("aab") == "<a><ab_>")
    // decode: symbols concatenate back to word + EOW marker
    val rt = Seq("aa", "ab", "aab").toDF("word")
      .select(col("word"),
        concat_ws("", Bpe.symbolsOf(Bpe.applyMerges(col("word"), merges))).as("flat"))
      .as[(String, String)].collect()
    rt.foreach { case (w, f) => assert(f == w + "_", s"$w round-trip broke: $f") }
  }

  test("wordFreqs: one corpus pass, alnum word types only, occurrence-weighted") {
    val docs = Seq((1L, "spark spark, the Spark!"), (2L, "spark x2")).toDF("doc_id", "text")
    val wf = Bpe.wordFreqs(docs, col("text")).as[(String, Long)].collect().toMap
    // "spark," and "Spark!" carry punctuation → filtered as non-alnum
    // types (lowercasing happens before the alnum gate)
    assert(wf == Map("spark" -> 2L, "the" -> 1L, "x2" -> 1L))
  }

  test("applyMerges (encode) runs on an actual stream — tokenize-on-arrival with a trained vocab") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val wf = Seq(("aa", 2L), ("ab", 1L)).toDF("word", "freq")
    val merges = Bpe.learnMerges(wf, 8)
      .orderBy("merge_rank")
      .select("sym_left", "sym_right").as[(String, String)].collect().toSeq
    val mem = MemoryStream[String]
    val enc = mem.toDF().toDF("word")
      .select(col("word"), Bpe.applyMerges(col("word"), merges).as("sym"))
    val q = enc.writeStream.outputMode("append")
      .format("memory").queryName("bpe_enc_out").start()
    try {
      mem.addData("aa", "ab")
      q.processAllAvailable()
      mem.addData("aab")
      q.processAllAvailable()
      val got = spark.table("bpe_enc_out").as[(String, String)].collect().toMap
      assert(got == Map("aa" -> "<aa_>", "ab" -> "<ab_>", "aab" -> "<a><ab_>"))
    } finally q.stop()
  }

  test("in-memory and distributed merge engines produce identical merge tables") {
    // fixture corpus: the real vocabulary, both engines via the
    // public entry point (maxLocalTypes=0 forces the distributed one)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val wf = Bpe.wordFreqs(docs, col("text")).persist()
    val local = Bpe.learnMerges(wf, 8)
      .as[(Int, String, String, Long)].collect().toSeq
    val dist = Bpe.learnMerges(wf, 8, maxLocalTypes = 0)
      .as[(Int, String, String, Long)].collect().toSeq
    wf.unpersist()
    assert(local == dist, "merge engines diverged on the fixture corpus")
    // early-stop parity on a pair-space-exhausting corpus
    val tiny = Seq(("aa", 2L), ("ab", 1L)).toDF("word", "freq")
    assert(Bpe.learnMerges(tiny, 8).collect().toSeq ==
      Bpe.learnMerges(tiny, 8, maxLocalTypes = 0).collect().toSeq)
  }

  test("256 merges run in O(1) Spark jobs (the in-memory iteration engine)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val wf = Bpe.wordFreqs(docs, col("text"))
    spark.sparkContext.setJobGroup("bpe_o1_jobs", "bpe job-count audit")
    val merges =
      try Bpe.learnMerges(wf, 256).as[(Int, String, String, Long)].collect().toSeq
      finally spark.sparkContext.clearJobGroup()
    // the sf0.001 vocabulary exhausts its pair space before 256 —
    // early stop is part of the contract; ranks must stay contiguous
    assert(merges.size > 64 && merges.map(_._1) == (1 to merges.size))
    // monotone non-increasing selection counts (argmax over a shrinking
    // pair space can plateau but never grow)
    assert(merges.sliding(2).forall { case Seq(a, b) => b._4 <= a._4; case _ => true })
    // the whole 256-merge loop launched at most a handful of jobs —
    // the corpus pass + the engine-selection count + the collect —
    // NOT one per merge (the status tracker is async; poll briefly
    // for the in-group jobs)
    val deadline = System.nanoTime() + 5_000_000_000L
    var jobs = spark.sparkContext.statusTracker.getJobIdsForGroup("bpe_o1_jobs")
    while (jobs.length < 1 && System.nanoTime() < deadline) {
      Thread.sleep(50)
      jobs = spark.sparkContext.statusTracker.getJobIdsForGroup("bpe_o1_jobs")
    }
    assert(jobs.length >= 1 && jobs.length <= 5,
      s"expected O(1) Spark jobs for 256 merges, saw ${jobs.length}")
  }

  test("fixture smoke: 8 merges learned deterministically, twice") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Bpe.learnMerges(Bpe.wordFreqs(docs, col("text")), 8)
      .as[(Int, String, String, Long)].collect().toSeq
    val b = Bpe.learnMerges(Bpe.wordFreqs(docs.repartition(7), col("text")), 8)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(a == b, "training must be partitioning-invariant")
    assert(a.size == 8 && a.map(_._1) == (1 to 8))
  }
}
