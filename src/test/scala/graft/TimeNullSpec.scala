package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.ops.{Skew, Time}

/** Null semantics and auto-selection of the hot-key-safe window forms.
  *
  * Null contract (ADVICE r7): the skew-safe variants must KEEP rows
  * with a null key or null timestamp and give them the same values as
  * the plain single-window forms (which group nulls into one window
  * partition / peer set) — previously the inner equality join-back
  * silently dropped them. The `<=>` join-back restores row-for-row
  * equivalence, proved here on a fixture where every null combination
  * occurs.
  *
  * Auto-selection (VERDICT r7 #3): `trailingSumsAuto`/`decayedScoreAuto`
  * must pick the pre-aggregated/chunked form when one key owns more
  * than ~1/32 of the rows and the plain form under uniform keys, and
  * both arms must agree with the plain result either way.
  */
class TimeNullSpec extends SparkSuite {
  import spark.implicits._

  // (event_id, user_id, es, value): nulls planted in key and time,
  // plus a null (key, time) pair; several same-second peers so the
  // RANGE-frame-peer case is live alongside the nulls.
  private def nullFixture: DataFrame = {
    val rows = Seq[(Long, java.lang.Long, java.lang.Long, Double)](
      (1L, 1L, 100L, 1.0), (2L, 1L, 100L, 2.0), (3L, 1L, 160L, 3.0),
      (4L, 1L, 400L, 4.0), (5L, 2L, 100L, 5.0),
      (6L, null, 100L, 6.0), (7L, null, 150L, 7.0), (8L, null, 150L, 8.0),
      (9L, 1L, null, 9.0), (10L, 2L, null, 10.0), (11L, null, null, 11.0),
      (12L, null, 400L, 12.0))
    rows.toDF("event_id", "user_id", "es", "value")
  }

  private def collectTrail(df: DataFrame): Map[Long, (Option[Long], Option[Double])] =
    df.select(col("event_id"), col("n"), col("v")).collect().map { r =>
      r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
                        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    }.toMap

  test("trailingSumsByTime keeps null key/ts rows and matches the plain window form") {
    val df = nullFixture
    val plain = collectTrail(
      Time.trailingSums(df, "user_id", "es", "value", 120, "n", "v"))
    val pre = collectTrail(
      Time.trailingSumsByTime(df, "user_id", "es", "value", 120, "n", "v"))
    assert(plain.size == 12, s"plain form lost rows: ${plain.keySet}")
    assert(pre.keySet == plain.keySet,
      s"preagg form dropped rows: missing ${plain.keySet -- pre.keySet}")
    plain.foreach { case (id, (n, v)) =>
      assert(pre(id) == ((n, v)), s"event $id: preagg ${pre(id)} != plain ($n, $v)")
    }
  }

  private def collectDecay(df: DataFrame): Map[Long, Option[Double]] =
    df.select(col("event_id"), col("ds")).collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    }.toMap

  test("withDecayedScoreChunked keeps null key/t rows and matches decayedScore") {
    val df = nullFixture.withColumn("t", col("es").cast("double") / 100.0)
    val plain = collectDecay(df.withColumn("ds",
      Time.decayedScore(col("user_id"), col("t"), col("event_id"), col("value"), 0.1)))
    val chunked = collectDecay(Time.withDecayedScoreChunked(df,
      "user_id", "t", "event_id", "value", lambda = 0.1, chunkSpan = 1.5, out = "ds"))
    assert(plain.size == 12)
    assert(chunked.keySet == plain.keySet,
      s"chunked form dropped rows: missing ${plain.keySet -- chunked.keySet}")
    plain.foreach { case (id, pv) =>
      (pv, chunked(id)) match {
        case (None, None) => // null t → null score in both forms
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)),
            s"event $id: chunked $b != plain $a")
        case other => fail(s"event $id: null-ness disagrees: $other")
      }
    }
  }

  private def skewed: DataFrame = {
    val rnd = new scala.util.Random(11)
    (1 to 2000).map { i =>
      val k = if (rnd.nextInt(100) < 40) 0L else 1L + rnd.nextInt(300)
      (i.toLong, k, (rnd.nextInt(500) * 4).toLong, rnd.nextDouble() * 10.0)
    }.toDF("event_id", "user_id", "es", "value")
  }

  private def uniform: DataFrame = {
    val rnd = new scala.util.Random(12)
    (1 to 2000).map { i =>
      (i.toLong, rnd.nextInt(600).toLong, (rnd.nextInt(500) * 4).toLong,
        rnd.nextDouble() * 10.0)
    }.toDF("event_id", "user_id", "es", "value")
  }

  test("maxKeyShare / isHotKeyed: skewed fixture trips the 1/32 threshold, uniform doesn't") {
    assert(Skew.maxKeyShare(skewed, col("user_id")) > 0.3)
    assert(Time.isHotKeyed(skewed, col("user_id")))
    assert(Skew.maxKeyShare(uniform, col("user_id")) < Time.HotKeyShareThreshold)
    assert(!Time.isHotKeyed(uniform, col("user_id")))
    assert(Skew.maxKeyShare(uniform.filter(lit(false)), col("user_id")) == 0.0)
    // nulls count as a key: a df that is 50% null-keyed is hot
    val halfNull = uniform.withColumn("user_id",
      when(col("event_id") % 2 === 0, col("user_id")))
    assert(Skew.maxKeyShare(halfNull, col("user_id")) >= 0.4)
  }

  test("trailingSumsAuto picks preagg under skew, plain under uniform; both match plain") {
    for (df <- Seq(skewed, uniform)) {
      val plain = collectTrail(
        Time.trailingSums(df, "user_id", "es", "value", 60, "n", "v"))
      val auto = collectTrail(
        Time.trailingSumsAuto(df, "user_id", "es", "value", 60, "n", "v"))
      assert(auto.keySet == plain.keySet)
      plain.foreach { case (id, (n, v)) =>
        val (an, av) = auto(id)
        assert(an == n, s"event $id: count ${an} != $n")
        // the preagg arm reassociates the sum (per-second partials)
        (v, av) match {
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)),
              s"event $id: sum $b != $a")
          case other => assert(v == av, s"event $id: $other")
        }
      }
    }
    // the arm choice itself: the auto form's plan under skew is the
    // preagg shape (join-back present), under uniform the single
    // window (no join)
    val skewPlan = Time.trailingSumsAuto(skewed, "user_id", "es", "value", 60)
      .queryExecution.optimizedPlan.toString
    assert(skewPlan.contains("Join"), s"skewed input did not pick preagg:\n$skewPlan")
    val uniPlan = Time.trailingSumsAuto(uniform, "user_id", "es", "value", 60)
      .queryExecution.optimizedPlan.toString
    assert(!uniPlan.contains("Join"), s"uniform input did not pick plain:\n$uniPlan")
  }

  test("decayedScoreAuto picks chunked under skew, plain under uniform; both match plain") {
    for (df0 <- Seq(skewed, uniform)) {
      val df = df0.withColumn("t", col("es").cast("double") / 100.0)
      val plain = collectDecay(df.withColumn("ds",
        Time.decayedScore(col("user_id"), col("t"), col("event_id"), col("value"), 0.1)))
      val auto = collectDecay(Time.decayedScoreAuto(df,
        "user_id", "t", "event_id", "value", lambda = 0.1, chunkSpan = 4.0, out = "ds"))
      assert(auto.keySet == plain.keySet)
      plain.foreach { case (id, pv) =>
        (pv, auto(id)) match {
          case (None, None) =>
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)))
          case other => fail(s"event $id: $other")
        }
      }
    }
    val skewPlan = Time.decayedScoreAuto(
        skewed.withColumn("t", col("es").cast("double") / 100.0),
        "user_id", "t", "event_id", "value", 0.1, 4.0)
      .queryExecution.optimizedPlan.toString
    assert(skewPlan.contains("Join"), s"skewed input did not pick chunked:\n$skewPlan")
    val uniPlan = Time.decayedScoreAuto(
        uniform.withColumn("t", col("es").cast("double") / 100.0),
        "user_id", "t", "event_id", "value", 0.1, 4.0)
      .queryExecution.optimizedPlan.toString
    assert(!uniPlan.contains("Join"), s"uniform input did not pick plain:\n$uniPlan")
  }
}
