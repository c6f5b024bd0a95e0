package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Funnel

/** Semantics of the product-analytics operators ([[graft.ops.Funnel]])
  * on hand-built event logs — order sensitivity, horizon/lookback
  * boundaries, and tie determinism that the q127-q132 oracles (which
  * mirror the same logic) cannot isolate per-rule.
  */
class AnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.zipWithIndex.map { case ((u, t, et), i) => (i.toLong, u, ts(t), et, 1.0) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")

  test("funnelSteps: order matters — a user with the steps out of order converts only the prefix") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:00:00", "purchase"),
      // user 2 purchases BEFORE clicking: reaches view+click only
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:30:00", "purchase"),
      (2L, "2024-01-01 11:00:00", "click"),
      // user 3 never views: in no step
      (3L, "2024-01-01 09:00:00", "click"),
      (3L, "2024-01-01 09:30:00", "purchase"))
    val r = Funnel.funnelSteps(e, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq
    assert(r === Seq((1, "view", 2L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnelSteps/funnelTimes release every cached stage (no persist leak)") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (2L, "2024-01-01 10:00:00", "view"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val steps = Seq("view", "click")
    val s = Funnel.funnelSteps(e, col("user_id"), col("ts"), col("event_type"), steps)
      .as[(Int, String, Long)].collect().toSeq
    assert(s === Seq((1, "view", 2L), (2, "click", 1L)))
    val t = Funnel.funnelTimes(e, col("user_id"), col("ts"), col("event_type"), steps)
    assert(t.count() === 2L)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"stages left cached: $leaked")
  }

  test("funnelSteps: horizon is anchored at ENTRY — a step inside the previous-step window but past the entry window is out") {
    val e = ev(
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-06 00:00:00", "click"),     // day 5: inside 7d of entry
      (1L, "2024-01-09 00:00:00", "purchase"),  // day 8: within 3d of click but PAST 7d of entry
      (2L, "2024-01-01 00:00:00", "view"),
      (2L, "2024-01-02 00:00:00", "click"),
      (2L, "2024-01-07 00:00:00", "purchase"))  // day 6: inside
    val r = Funnel.funnelSteps(e, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"), horizon = "7 days")
      .as[(Int, String, Long)].collect().toSeq
    assert(r === Seq((1, "view", 2L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnelSteps: equal timestamps do NOT advance (strictly increasing)") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:00:00", "click"))
    val r = Funnel.funnelSteps(e, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click"))
      .as[(Int, String, Long)].collect().toSeq
    assert(r === Seq((1, "view", 1L), (2, "click", 0L)))
  }

  test("retentionCohorts: cohort = week of first activity, offsets in whole weeks") {
    val e = ev(
      (1L, "2024-01-02 10:00:00", "view"),  // week of Mon 2024-01-01
      (1L, "2024-01-10 10:00:00", "view"),  // offset 1
      (1L, "2024-01-24 10:00:00", "view"),  // offset 3
      (2L, "2024-01-10 09:00:00", "view"),  // cohort week 2024-01-08
      (2L, "2024-01-11 09:00:00", "view"))  // same week — one row
    val r = Funnel.retentionCohorts(e, col("user_id"), col("ts"))
      .as[(String, Int, Long)].collect().toSet
    assert(r === Set(
      ("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L), ("2024-01-01", 3, 1L),
      ("2024-01-08", 0, 1L)))
  }

  test("lastTouchAttribution: lookback boundary, direct fallback, and same-ts tie broken by event id") {
    val e = Seq(
      // user 1: click 2 days before purchase — attributed
      (1L, 1L, ts("2024-01-01 00:00:00"), "click", 0.0),
      (2L, 1L, ts("2024-01-03 00:00:00"), "purchase", 10.0),
      // user 2: view 4 days before purchase — outside 3d lookback
      (3L, 2L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (4L, 2L, ts("2024-01-05 00:00:00"), "purchase", 20.0),
      // user 3: no touch at all
      (5L, 3L, ts("2024-01-02 00:00:00"), "purchase", 30.0),
      // user 4: view and click at the SAME instant — higher event_id wins
      (6L, 4L, ts("2024-01-02 00:00:00"), "view", 0.0),
      (7L, 4L, ts("2024-01-02 00:00:00"), "click", 0.0),
      (8L, 4L, ts("2024-01-02 01:00:00"), "purchase", 40.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = Funnel.lastTouchAttribution(e, col("user_id"), col("ts"),
        col("event_type"), col("event_id"),
        Seq("view", "click", "signup"), "purchase", col("value"), "3 days")
      .as[(String, Long, Double)].collect().map { case (c, n, v) => c -> ((n, v)) }.toMap
    assert(r("click") === ((2L, 50.0)))   // users 1 and 4
    assert(r("direct") === ((2L, 50.0)))  // users 2 and 3
    assert(!r.contains("view"))
  }

  test("lastTouchAttribution: exact lookback boundary is inclusive") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (2L, 1L, ts("2024-01-04 00:00:00"), "purchase", 5.0)) // exactly 3 days
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = Funnel.lastTouchAttribution(e, col("user_id"), col("ts"),
        col("event_type"), col("event_id"),
        Seq("view"), "purchase", col("value"), "3 days")
      .as[(String, Long, Double)].collect().map { case (c, n, v) => c -> n }.toMap
    assert(r === Map("view" -> 1L))
  }

  test("pathTransitions: gap filter drops slow transitions; probabilities sum to 1 per source") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),   // view->click (5m)
      (1L, "2024-01-01 10:30:00", "view"),    // click->view dropped (25m)
      (1L, "2024-01-01 10:31:00", "click"),   // view->click (1m)
      (2L, "2024-01-01 09:00:00", "view"),
      (2L, "2024-01-01 09:02:00", "purchase"))// view->purchase (2m)
    val r = Funnel.pathTransitions(e, col("user_id"), col("ts"),
        col("event_type"), col("event_id"))
      .as[(String, String, Long, Double)].collect().toSeq
    val m = r.map { case (f, t, n, p) => (f, t) -> ((n, p)) }.toMap
    assert(m === Map(
      ("view", "click") -> ((2L, 0.666667)),
      ("view", "purchase") -> ((1L, 0.333333))))
  }

  test("abTest: conversion must land STRICTLY after first exposure; unexposed users are out") {
    import graft.ops.Experiment
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view"),      // converts (purchase after)
      (1L, "2024-01-01 11:00:00", "purchase"),
      (2L, "2024-01-01 10:00:00", "purchase"),  // purchase BEFORE view: no
      (2L, "2024-01-01 11:00:00", "view"),
      (3L, "2024-01-01 10:00:00", "view"),      // tie: not strictly after
      (3L, "2024-01-01 10:00:00", "purchase"),
      (4L, "2024-01-01 10:00:00", "click"),     // never exposed: excluded
      (4L, "2024-01-01 11:00:00", "purchase"))
    val r = Experiment.abTest(e, "user_id", col("ts"), col("event_type"),
        "view", "purchase")
      .select("n_control", "conv_control", "n_treatment", "conv_treatment")
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 + r._3 === 3L, "exposed users: 1, 2, 3")
    assert(r._2 + r._4 === 1L, "only user 1 converts")
  }

  test("abTest: assignment is deterministic across reruns and partitionings; degenerate readouts are null, not an error") {
    import graft.ops.Experiment
    val e = ev((1L to 40L).map(u =>
      (u, "2024-01-01 10:00:00", "view")) ++ (1L to 40L).map(u =>
      (u, "2024-01-01 11:00:00", "purchase")): _*)
    val once = Experiment.abTest(e, "user_id", col("ts"), col("event_type"),
      "view", "purchase").collect().head
    val again = Experiment.abTest(e.repartition(7), "user_id", col("ts"),
      col("event_type"), "view", "purchase").collect().head
    assert(once === again)
    // everyone converted: rates are 1.0, pooled variance is 0 → z null
    assert(once.getAs[Double]("rate_control") === 1.0)
    assert(once.getAs[Double]("rate_treatment") === 1.0)
    assert(once.isNullAt(once.fieldIndex("z_score")))
    // and the split is the assignSplit hash, not row order: arms reunite to 40
    assert(once.getAs[Long]("n_control") + once.getAs[Long]("n_treatment") === 40L)
  }

  test("abTest: z is positive when treatment converts more, negative when control does") {
    import graft.ops.Experiment
    // one converting + one non-converting user per arm is not enough to
    // pin signs; build arms from the hash itself so the fixture can't
    // drift: probe which arm each key lands in, then plant conversions
    val probe = Experiment.abTest(
      ev((1L to 20L).map(u => (u, "2024-01-01 10:00:00", "view")): _*),
      "user_id", col("ts"), col("event_type"), "view", "purchase")
      .select("n_control", "n_treatment").as[(Long, Long)].head()
    assert(probe._1 > 0 && probe._2 > 0, "fixture must populate both arms")
    val assign = graft.ops.Sampling.assignSplit("user_id",
      Seq("control" -> 0.5, "treatment" -> 0.5))
    val arms = (1L to 20L).toDF("user_id").select(col("user_id"), assign.as("v"))
      .as[(Long, String)].collect().toMap
    val treatUser = arms.collectFirst { case (u, "treatment") => u }.get
    val rows = (1L to 20L).map(u => (u, "2024-01-01 10:00:00", "view")) :+
      ((treatUser, "2024-01-01 11:00:00", "purchase"))
    val z = Experiment.abTest(ev(rows: _*), "user_id", col("ts"),
        col("event_type"), "view", "purchase")
      .select("z_score").as[Double].head()
    assert(z > 0, s"lone treatment conversion must push z positive, got $z")
  }

  test("chiSquare: two 50/50 arms reduce to z² at dof 1; all-converted outcome nulls the statistic") {
    import graft.ops.Experiment
    val assign = graft.ops.Sampling.assignSplit("user_id",
      Seq("control" -> 0.5, "treatment" -> 0.5))
    val arms = (1L to 30L).toDF("user_id").select(col("user_id"), assign.as("v"))
      .as[(Long, String)].collect().toMap
    // convert two treatment users and one control user
    val convs = (arms.collectFirst { case (u, "control") => u }.toSeq ++
      arms.collect { case (u, "treatment") => u }.take(2))
      .map(u => (u, "2024-01-01 11:00:00", "purchase"))
    val rows = (1L to 30L).map(u => (u, "2024-01-01 10:00:00", "view")) ++ convs
    val twoArm = Seq("control" -> 0.5, "treatment" -> 0.5)
    val chi = Experiment.chiSquare(ev(rows: _*), "user_id", col("ts"),
        col("event_type"), "view", "purchase", twoArm)
      .select("chi2", "dof").as[(Double, Long)].collect()
    assert(chi.map(_._2).toSeq === Seq(1L, 1L))
    val z = Experiment.abTest(ev(rows: _*), "user_id", col("ts"),
        col("event_type"), "view", "purchase").select("z_score").as[Double].head()
    assert(math.abs(chi.head._1 - z * z) < 1e-6,
      s"two-arm chi2 ${chi.head._1} must equal z² ${z * z}")
    // degenerate: everyone converts → expected non-conversions are 0
    val allConv = (1L to 30L).map(u => (u, "2024-01-01 10:00:00", "view")) ++
      (1L to 30L).map(u => (u, "2024-01-01 11:00:00", "purchase"))
    val d = Experiment.chiSquare(ev(allConv: _*), "user_id", col("ts"),
      col("event_type"), "view", "purchase", twoArm).collect()
    assert(d.forall(_.isNullAt(d.head.fieldIndex("chi2"))))
    assert(d.forall(r => r.getDouble(r.fieldIndex("rate")) === 1.0))
  }

  test("cuped: identical pre/post behavior gives θ=1, ρ²=1 and collapses adjusted means to the grand mean; zero pre-variance nulls the adjustment") {
    import graft.ops.Experiment
    def cents(v: Double) = math.round(v * 100).toDouble / 100
    // user u purchases u dollars once BEFORE and once AFTER cutover:
    // x_u == y_u exactly, so θ = 1, ρ² = 1, and y′_u = x̄ for every u
    val rows = (1L to 24L).flatMap { u =>
      Seq((u, "2024-01-02 10:00:00", "view", 0.0),
        (u, "2024-01-03 10:00:00", "purchase", cents(u.toDouble)),
        (u, "2024-01-20 10:00:00", "purchase", cents(u.toDouble)))
    }
    val df = rows.zipWithIndex
      .map { case ((u, t, et, v), i) => (i.toLong, u, ts(t), et, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Experiment.cuped(df, "user_id", col("ts"), col("event_type"),
        col("value"), "view", "purchase", "2024-01-10 00:00:00",
        Seq("control" -> 0.5, "treatment" -> 0.5))
      .orderBy("variant").collect()
    assert(out.length === 2)
    val grandMeanCents = (1 to 24).map(_ * 100).sum / 24.0
    out.foreach { r =>
      assert(r.getDouble(r.fieldIndex("theta")) === 1.0)
      assert(r.getDouble(r.fieldIndex("rho2")) === 1.0)
      assert(r.getDouble(r.fieldIndex("mean_post_adj")) === grandMeanCents,
        s"adjusted mean must collapse to the grand mean for $r")
    }
    // raw means differ across arms (different user subsets) — the
    // adjustment is what removed that variance
    assert(out(0).getDouble(out(0).fieldIndex("mean_post")) !==
      out(1).getDouble(out(1).fieldIndex("mean_post")))
    // zero pre-period variance: same pre cents for everyone → null θ/ρ²/adj
    val flat = (1L to 10L).flatMap { u =>
      Seq((u, "2024-01-02 10:00:00", "view", 0.0),
        (u, "2024-01-03 10:00:00", "purchase", 5.0),
        (u, "2024-01-20 10:00:00", "purchase", cents(u.toDouble)))
    }
    val fdf = flat.zipWithIndex
      .map { case ((u, t, et, v), i) => (i.toLong, u, ts(t), et, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val fr = Experiment.cuped(fdf, "user_id", col("ts"), col("event_type"),
      col("value"), "view", "purchase", "2024-01-10 00:00:00",
      Seq("control" -> 0.5, "treatment" -> 0.5)).collect()
    fr.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("theta")))
      assert(r.isNullAt(r.fieldIndex("rho2")))
      assert(r.isNullAt(r.fieldIndex("mean_post_adj")))
      assert(!r.isNullAt(r.fieldIndex("mean_post")))
    }
  }

  test("overlapMatrix: hand-counted pairwise intersections and Jaccard; event volume is irrelevant") {
    import graft.ops.Audience
    // users: 1 → {a,b}, 2 → {a}, 3 → {a,b,c}; user 2 repeats 'a' 5×
    val e = ev(
      Seq((1L, "2024-01-01 10:00:00", "a"), (1L, "2024-01-01 11:00:00", "b"),
        (3L, "2024-01-01 10:00:00", "a"), (3L, "2024-01-01 11:00:00", "b"),
        (3L, "2024-01-01 12:00:00", "c")) ++
      (1 to 5).map(i => (2L, s"2024-01-01 10:0$i:00", "a")): _*)
    val m = Audience.overlapMatrix(e, col("user_id"), col("event_type"))
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(m === Map(
      ("a", "b") -> ((3L, 2L, 2L, round9(2.0 / 3))),
      ("a", "c") -> ((3L, 1L, 1L, round9(1.0 / 3))),
      ("b", "c") -> ((2L, 1L, 1L, 0.5))))
  }

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("overlapSketch: exact on small audiences (list/set mode), invariant to partitioning") {
    import graft.ops.Audience
    val e = ev(
      Seq((1L, "2024-01-01 10:00:00", "a"), (1L, "2024-01-01 11:00:00", "b"),
        (3L, "2024-01-01 10:00:00", "a"), (3L, "2024-01-01 11:00:00", "b"),
        (3L, "2024-01-01 12:00:00", "c")) ++
      (1 to 5).map(i => (2L, s"2024-01-01 10:0$i:00", "a")): _*)
    def run(df: org.apache.spark.sql.DataFrame) =
      Audience.overlapSketch(df, col("user_id"), col("event_type"))
        .as[(String, String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val est = run(e)
    assert(est === Map(
      ("a", "b") -> ((3L, 2L, 2L)),
      ("a", "c") -> ((3L, 1L, 1L)),
      ("b", "c") -> ((2L, 1L, 1L))))
    assert(run(e.repartition(7)) === est)
  }

  test("funnelTimes: entry-anchored seconds with interpolated percentiles; counts agree with funnelSteps") {
    import graft.ops.Funnel
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:10:00", "click"),    // dt 600
      (1L, "2024-01-01 11:00:00", "purchase"), // dt 3600
      (2L, "2024-01-01 09:00:00", "view"),
      (2L, "2024-01-01 09:20:00", "click"))    // dt 1200
    val steps = Seq("view", "click", "purchase")
    val t = Funnel.funnelTimes(e, col("user_id"), col("ts"), col("event_type"), steps)
      .as[(Int, String, Long, Double, Double)].collect().toSeq
    assert(t.map(r => (r._1, r._3)) === Seq((1, 2L), (2, 2L), (3, 1L)))
    val byStep = t.map(r => r._1 -> ((r._4, r._5))).toMap
    assert(byStep(1) === ((0.0, 0.0)))
    // two click dts {600, 1200}: p50 interpolates to 900, p90 to 1140
    assert(byStep(2) === ((900.0, 1140.0)))
    assert(byStep(3) === ((3600.0, 3600.0)))
    val c = Funnel.funnelSteps(e, col("user_id"), col("ts"), col("event_type"), steps)
      .as[(Int, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(t.map(r => r._1 -> r._3).toMap === c)
  }
}
