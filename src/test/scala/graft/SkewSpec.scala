package graft

import org.apache.spark.sql.functions._
import graft.ops.Time

/** Hot-key behavior of the window family: the chunked decay variant
  * must agree with the single-window form (up to reassociation ulps)
  * on data WITH a planted hot key, and its first pass must really
  * shuffle on (key, chunk) — that split is the whole mitigation.
  */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  private def fixture(hotShare: Int) = {
    // 3000 rows, ~hotShare% owned by user 0, rest spread over 500 keys
    val rnd = new scala.util.Random(42)
    (1 to 3000).map { i =>
      val k = if (rnd.nextInt(100) < hotShare) 0L else 1L + rnd.nextInt(500)
      (i.toLong, k, rnd.nextDouble() * 30.0, rnd.nextDouble() * 10.0)
    }.toDF("event_id", "user_id", "t", "value")
  }

  test("mixtureSample: unlisted sources excluded, rates capped, reproducible") {
    import graft.ops.Sampling
    val df = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val kept = Sampling.mixtureSample(df, col("src"), "id",
      Seq("s0" -> 0.5, "s1" -> 0.5), totalN = 60L)
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // s2 unlisted -> excluded entirely (least() null-skip regression)
    assert(!bySrc.contains("s2"), s"unlisted source kept: $bySrc")
    // rate = 0.5*60/100 = 0.3 per listed source: ~30 of 100 kept each
    Seq("s0", "s1").foreach { s =>
      assert(bySrc(s) > 10 && bySrc(s) < 50, s"rate off for $s: $bySrc")
    }
    // reproducible: second run identical row set
    val again = Sampling.mixtureSample(df, col("src"), "id",
      Seq("s0" -> 0.5, "s1" -> 0.5), totalN = 60L)
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
    // over-requested source caps at rate 1 (keeps everything)
    val capped = Sampling.mixtureSample(df, col("src"), "id",
      Seq("s0" -> 1.0), totalN = 500L)
    assert(capped.count() == 100)
  }

  test("temperatureMixture: α=0.5 upsamples the tail relative to the head; reproducible; α=1 ≈ uniform rate") {
    import graft.ops.Sampling
    // head source 900 rows, tail source 100 rows
    val df = (0L until 1000L).map(i => (i, if (i < 900) "head" else "tail"))
      .toDF("id", "src")
    val kept = Sampling.temperatureMixture(df, col("src"), "id", totalN = 400L)
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // shares ∝ sqrt(cnt): head 30/(30+10)=0.75 of 400 = 300 over 900 rows
    // (rate ⅓) vs tail 0.25·400 = 100 over 100 rows (rate 1, capped):
    // the tail's keep-RATE must exceed the head's
    val headRate = bySrc.getOrElse("head", 0L).toDouble / 900
    val tailRate = bySrc.getOrElse("tail", 0L).toDouble / 100
    assert(tailRate > headRate * 2,
      s"α=0.5 must upsample the tail: head=$headRate tail=$tailRate")
    assert(tailRate > 0.9, s"capped tail should keep ~all: $tailRate")
    // deterministic rerun
    val again = Sampling.temperatureMixture(df, col("src"), "id", totalN = 400L)
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
    // α=1 degenerates to a uniform corpus-wide rate (share ∝ count)
    val a1 = Sampling.temperatureMixture(df, col("src"), "id",
      totalN = 400L, alpha = 1.0)
    val r1 = a1.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val h1 = r1.getOrElse("head", 0L).toDouble / 900
    val t1 = r1.getOrElse("tail", 0L).toDouble / 100
    assert(math.abs(h1 - t1) < 0.15, s"α=1 rates should match: head=$h1 tail=$t1")
  }

  test("partitionsForCorpus schedule: floor at the session default, linear growth, cap") {
    import graft.ops.Skew
    assert(Skew.partitionsForCorpus(1000) == 32)                 // floor
    assert(Skew.partitionsForCorpus(320000) == 32)               // fixture scale: == pinned
    assert(Skew.partitionsForCorpus(32L << 18) == 32)            // exactly at the knee
    assert(Skew.partitionsForCorpus(64L << 18) == 64)            // then linear in rows
    assert(Skew.partitionsForCorpus(640L << 18) == 640)
    assert(Skew.partitionsForCorpus(Long.MaxValue / 4) == 100000) // cap
    assert(Skew.partitionsForCorpus(1L << 22, rowsPerPartition = 1 << 16) == 64)
  }

  test("autoJoin salts under a hot key, stays plain under uniform keys, equal results") {
    import graft.ops.Skew
    val dim = (0L to 500L).map(k => (k, s"d$k")).toDF("user_id", "label")
    for (hotShare <- Seq(0, 50)) {
      val big = fixture(hotShare)
      val auto = Skew.autoJoin(big, dim, "user_id", n = 8)
      val plain = big.join(dim, Seq("user_id"))
      assert(auto.count() == plain.count())
      val salted = auto.queryExecution.analyzed.toString.contains("_salt")
      assert(salted == (hotShare == 50),
        s"hotShare=$hotShare expected salted=${hotShare == 50}")
      // value equivalence, not just cardinality
      val a = auto.agg(sum(col("value") * length(col("label")))).head.getDouble(0)
      val p = plain.agg(sum(col("value") * length(col("label")))).head.getDouble(0)
      assert(math.abs(a - p) < 1e-6)
    }
  }

  test("withDecayedScoreChunked == decayedScore on hot-key data (1e-9 relative)") {
    for (hotShare <- Seq(0, 50)) {
      val df = fixture(hotShare)
      val plain = df.withColumn("ds",
          Time.decayedScore(col("user_id"), col("t"), col("event_id"), col("value"), 0.1))
        .select(col("event_id"), col("ds")).as[(Long, Double)].collect().toMap
      val chunked = Time.withDecayedScoreChunked(df,
          "user_id", "t", "event_id", "value", lambda = 0.1, chunkSpan = 5.0, out = "ds")
        .select(col("event_id"), col("ds")).as[(Long, Double)].collect().toMap
      assert(plain.keySet == chunked.keySet)
      plain.foreach { case (id, v) =>
        val c = chunked(id)
        assert(math.abs(v - c) <= 1e-9 * math.max(1.0, math.abs(v)),
          s"hotShare=$hotShare event $id: plain=$v chunked=$c")
      }
    }
  }

  test("chunked pass 1 shuffles on (key, chunk); AQE reuses the shared subtree's exchange") {
    // through parquet: a LocalRelation fixture folds filters into
    // the relation on one branch only, defeating the very subtree
    // identity this test asserts (the real callers scan files)
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    fixture(50).write.mode("overwrite").parquet(dir)
    // project value away like real consumers (q88): keeping it alive
    // on one branch only would desynchronize column pruning between
    // the two subtrees and legitimately block reuse
    val df = Time.withDecayedScoreChunked(spark.read.parquet(dir),
        "user_id", "t", "event_id", "value", lambda = 0.1, chunkSpan = 5.0)
      .select(col("event_id"), col("user_id"), col("decay_score"))
    df.count()
    // finalize the adaptive plan on df's own queryExecution (count()
    // executes a derived agg plan, leaving this one isFinalPlan=false)
    df.queryExecution.executedPlan.execute().count()
    val plan = df.queryExecution.executedPlan.toString
    // the within-chunk window's exchange must carry __chunk in its key
    assert(plan.linesIterator.exists(l =>
      l.contains("hashpartitioning(user_id") && l.contains("__chunk")),
      s"no (user_id, __chunk) exchange in plan:\n${plan.take(2000)}")
    // the offsets branch must REUSE the within branch's shuffle —
    // the early join-key null filter keeps both subtrees identical;
    // without it the join pushes isnotnull(floor(...)) into one
    // scan only and the source is read+shuffled twice
    assert(plan.contains("ReusedExchange"),
      s"offsets branch re-plans the pair subtree:\n${plan.take(3000)}")
  }

  test("trailingSumsByTime == plain RANGE window, incl. same-second peers and a hot key") {
    // coarse seconds force many same-second rows (the frame-peer case
    // the equivalence rests on) and user 0 owns ~half the rows
    val rnd = new scala.util.Random(7)
    val df = (1 to 4000).map { i =>
      val k = if (rnd.nextBoolean()) 0L else 1L + rnd.nextInt(50)
      (i.toLong, k, (rnd.nextInt(600) * 6).toLong, rnd.nextDouble() * 10.0)
    }.toDF("event_id", "user_id", "es", "value")
    val plain = df
      .withColumn("n", count(lit(1)).over(
        Time.trailingWindow(col("user_id"), col("es"), 120)))
      .withColumn("v", sum(col("value")).over(
        Time.trailingWindow(col("user_id"), col("es"), 120)))
      .select(col("event_id"), col("n"), col("v"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val pre = Time.trailingSumsByTime(df, "user_id", "es", "value", 120, "n", "v")
      .select(col("event_id"), col("n"), col("v"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(plain.keySet == pre.keySet)
    plain.foreach { case (id, (n, v)) =>
      val (pn, pv) = pre(id)
      assert(pn == n, s"event $id: count $pn != $n")
      assert(math.abs(pv - v) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"event $id: sum $pv != $v")
    }
  }

  test("a single chunk degenerates to the plain form (all rows in chunk 0)") {
    val df = fixture(50)
    val plain = df.withColumn("ds",
        Time.decayedScore(col("user_id"), col("t"), col("event_id"), col("value"), 0.1))
      .select(col("event_id"), col("ds")).as[(Long, Double)].collect().toMap
    val oneChunk = Time.withDecayedScoreChunked(df,
        "user_id", "t", "event_id", "value", lambda = 0.1, chunkSpan = 1e9, out = "ds")
      .select(col("event_id"), col("ds")).as[(Long, Double)].collect().toMap
    plain.foreach { case (id, v) =>
      assert(math.abs(v - oneChunk(id)) <= 1e-9 * math.max(1.0, math.abs(v)))
    }
  }
}
