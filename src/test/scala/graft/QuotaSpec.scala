package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

class QuotaSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    // source a: tokens 5, 4, 6, 2 — budget 10 keeps 5, 4, and the
    // boundary-crossing 6 (tokens-before 9 < 10), drops the 2
    (1L, "a", 5L), (2L, "a", 4L), (3L, "a", 6L), (4L, "a", 2L),
    // source b: budget 10 keeps the single 30-token doc (0 < 10)
    (5L, "b", 30L), (6L, "b", 1L),
    // source c has no budget row — dropped entirely
    (7L, "c", 1L)
  ).toDF("doc_id", "source", "n_tokens")

  test("tokenBudgetSample: greedy cut, boundary doc kept, unlisted source dropped") {
    val got = Sampling.tokenBudgetSample(corpus, col("source"), col("doc_id"),
        col("n_tokens"), Seq("a" -> 10L, "b" -> 10L))
      .orderBy("source", "doc_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 5L, 0L), ("a", 2L, 4L, 5L), ("a", 3L, 6L, 9L),
      ("b", 5L, 30L, 0L)), s"got $got")
    // zero budget keeps nothing from that source
    val z = Sampling.tokenBudgetSample(corpus, col("source"), col("doc_id"),
      col("n_tokens"), Seq("a" -> 0L, "b" -> 10L))
    assert(z.filter(col("source") === "a").isEmpty)
  }

  test("batch cut ≡ streaming quota on the same arrival order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val stream = graft.streaming.EventStream.quotaSampleStream(
      mem.toDF().toDF("doc_id", "source", "n_tokens"), quotaTokens = 10L)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("quota_batch_eq").start()
    try {
      mem.addData(Seq((1L, "a", 5L), (2L, "a", 4L), (3L, "a", 6L),
        (4L, "a", 2L), (5L, "b", 30L), (6L, "b", 1L), (7L, "c", 1L)): _*)
      q.processAllAvailable()
      val streamed = spark.table("quota_batch_eq")
        .select("doc_id").as[Long].collect().toSet
      val batch = Sampling.tokenBudgetSample(corpus, col("source"), col("doc_id"),
          col("n_tokens"), Seq("a" -> 10L, "b" -> 10L, "c" -> 10L))
        .select("doc_id").as[Long].collect().toSet
      assert(batch == streamed,
        s"batch $batch != streamed $streamed - the quota rules diverged")
    } finally q.stop()
  }

  test("invariance: partition count does not change the cut") {
    val base = Sampling.tokenBudgetSample(corpus, col("source"), col("doc_id"),
      col("n_tokens"), Seq("a" -> 10L, "b" -> 10L))
    val rep = Sampling.tokenBudgetSample(corpus.repartition(7), col("source"),
      col("doc_id"), col("n_tokens"), Seq("a" -> 10L, "b" -> 10L))
    assert(base.except(rep).isEmpty && rep.except(base).isEmpty)
  }

  test("epochAllocation: hand-computed water-fill with caps redistributing") {
    // per-source tokens 100/400/10000, E=4 -> caps 400/1600/40000;
    // sqrt weights 10e6/20e6/100e6; r = 4e-5/8e-5/4e-4. Budget 20000:
    // the valid level is k=3 (A and B saturated),
    // lam = (20000-2000)/100e6 = 1.8e-4 -> C draws 18000 (1.8 epochs)
    val docs = (
      (1 to 10).map(i => (s"d$i", "a", 10L)) ++     // t=100
      (1 to 10).map(i => (s"e$i", "b", 40L)) ++     // t=400
      (1 to 10).map(i => (s"f$i", "c", 1000L))      // t=10000
    ).toDF("doc_id", "source", "nt")
    val got = Sampling.epochAllocation(docs, col("source"), col("nt"),
        budget = 20000L, maxEpochs = 4.0)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("a", 100L, 10000000L, 400L, 4000000L, true),
      ("b", 400L, 20000000L, 1600L, 4000000L, true),
      ("c", 10000L, 100000000L, 18000L, 1800000L, false)))
    assert(got.map(_._4).sum == 20000L)  // the budget is spent exactly
    // budget >= sum of caps: no valid level, everything caps at E
    val all = Sampling.epochAllocation(docs, col("source"), col("nt"),
        budget = 50000L, maxEpochs = 4.0)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(all.forall(r => r._5 == 4000000L && r._6) && all.map(_._4).sum == 42000L)
    // partitioning invariance (the window runs over the source table)
    val rep2 = Sampling.epochAllocation(docs.repartition(7), col("source"),
      col("nt"), budget = 20000L, maxEpochs = 4.0)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(rep2 == got)
  }

  test("epochAllocation: the α=½ weight is the EXACT integer sqrt (isqrt(t·10¹²))") {
    // the r16 integer-exact decision path hinges on w = isqrt(t·10¹²)
    // being bit-identical on every engine; the implementation is a
    // double guess + ±2 integer adjustment, so stress it with
    // adversarial t — perfect squares at the 10⁶ unit scale and their
    // ±1 neighbors (where round-vs-floor and guess-off-by-one bite),
    // tiny t, huge t (past double's 2⁵³ for t·10¹²), and a seeded
    // random sweep. Ground truth: BigInt Newton isqrt.
    def isqrt(n: BigInt): BigInt = {
      var x = BigInt(math.sqrt(n.toDouble).toLong + 2)
      while (x * x > n) x = (x + n / x) / 2
      x
    }
    val rnd = new scala.util.Random(7)
    val ts = (Seq(1L, 2L, 3L, 99L, 100L, 101L, 9999L, 10000L, 10001L,
        1000000L, 1000000000L, 10000000000000L - 1, 10000000000000L) ++
      (999999L to 1000020L).map(k => k * k / 1000000L) ++
      Seq.fill(200)(1L + math.abs(rnd.nextLong()) % 10000000000000L)).distinct
    val docs = ts.zipWithIndex.map { case (t, i) => (f"s$i%05d", t) }
      .toDF("source", "nt")
    val got = Sampling.epochAllocation(docs, col("source"), col("nt"),
        budget = 1L << 60, maxEpochs = 4.0)
      .select("source", "n_tokens", "weight")
      .as[(String, Long, Long)].collect()
    got.foreach { case (s, t, w) =>
      val expect = isqrt(BigInt(t) * BigInt(1000000000000L))
      assert(BigInt(w) == expect, s"$s: t=$t weight=$w expected isqrt=$expect")
    }
    assert(got.length == ts.length)
  }
}
