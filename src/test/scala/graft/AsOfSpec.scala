package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.AsOf

/** Backward as-of join and banded range join (⊕ time-series ops):
  * hand-computed expectations plus a naive-join equivalence check over
  * a randomized fixture, so the banding/window mechanics are verified
  * against the direct O(n²) definition.
  */
class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    // (id, key, ts)
    (100L, 1L, ts("2024-01-01 10:00:00")),
    (101L, 1L, ts("2024-01-01 12:00:00")),
    (102L, 2L, ts("2024-01-01 09:00:00")),  // no earlier right row
    (103L, 3L, ts("2024-01-01 09:00:00"))   // key with no right rows
  ).toDF("id", "k", "t")

  private val right = Seq(
    (200L, 1L, ts("2024-01-01 09:30:00"), 1.0),
    (201L, 1L, ts("2024-01-01 11:00:00"), 2.0),
    (202L, 1L, ts("2024-01-01 12:00:00"), 3.0),  // equal-ts: at-or-before includes it
    (203L, 1L, ts("2024-01-01 12:00:00"), 4.0),  // equal ts twice -> greatest id wins
    (204L, 2L, ts("2024-01-01 09:30:00"), 5.0)   // after 102 -> unmatched
  ).toDF("id", "k", "t", "v")

  test("asofJoinBackward picks greatest at-or-before ts, greatest id on ties, null when none") {
    val got = AsOf.asofJoinBackward(left, right,
        key = "k", leftTs = "t", rightTs = "t", tie = "id")
      .select(col("l.id").as("lid"), col("r.id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(
      100L -> Some(200L),   // 09:30 is the only earlier click
      101L -> Some(203L),   // 12:00 tie -> id 203 beats 202; 11:00 loses
      102L -> None,         // right row exists but later
      103L -> None))        // no right rows for key at all
  }

  test("asofJoinForward picks smallest at-or-after ts, smallest id on ties; tolerance nulls far matches") {
    val fwd = AsOf.asofJoinForward(left, right,
        key = "k", leftTs = "t", rightTs = "t", tie = "id")
      .select(col("l.id").as("lid"), col("r.id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fwd == Map(
      100L -> Some(201L),   // 11:00 is the first at-or-after 10:00
      101L -> Some(202L),   // equal-ts 12:00 included; smallest id wins (202 < 203)
      102L -> Some(204L),   // 09:30 right after the 09:00 left row
      103L -> None))        // key with no right rows
    val tol = AsOf.asofJoinForward(left, right,
        key = "k", leftTs = "t", rightTs = "t", tie = "id",
        toleranceSec = Some(1800L))  // 30 min
      .select(col("l.id").as("lid"), col("r.id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(tol == Map(
      100L -> None,         // 11:00 is 60 min after 10:00 -> beyond tolerance
      101L -> Some(202L),   // equal ts, 0 min
      102L -> Some(204L),   // 30 min, inclusive boundary
      103L -> None))
  }

  test("null join keys never match (SQL join semantics), left null-key rows kept unmatched") {
    val ln = Seq((Some(1L), 300L), (None, 301L)).map { case (k, id) =>
      (id, k, ts("2024-01-01 10:00:00"))
    }.toDF("id", "k", "t")
    val rn = Seq((Some(1L), 400L), (None, 401L)).map { case (k, id) =>
      (id, k, ts("2024-01-01 09:00:00"), 1.0)
    }.toDF("id", "k", "t", "v")
    val got = AsOf.asofJoinBackward(ln, rn, "k", "t", "t", tie = "id")
      .select(col("l.id").as("lid"), col("r.id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    // keyed row matches its keyed partner; the null-key left row is
    // kept but never pairs with the null-key right row
    assert(got == Map(300L -> Some(400L), 301L -> None))
  }

  test("null right timestamps never match (r.ts <= l.ts is never true on null)") {
    // A null-ts right row sorts to the FRONT of the ascending backward
    // frame; without the right-side isNotNull filter, last(ignoreNulls)
    // would return it as a phantom match for left rows that have no
    // genuine at-or-before candidate (divergence vs the SQL form when
    // toleranceSec is None — the tolerance gate masked it otherwise).
    val rn = Seq(
      (500L, 1L, Option.empty[Timestamp], 9.0),           // null ts, key 1
      (501L, 2L, Option(ts("2024-01-01 11:00:00")), 1.0)  // later than left 102
    ).toDF("id", "k", "t", "v")
    val got = AsOf.asofJoinBackward(left, rn, "k", "t", "t", tie = "id")
      .select(col("l.id").as("lid"), col("r.id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(100L -> None, 101L -> None, 102L -> None, 103L -> None))
    val fwd = AsOf.asofJoinForward(left, rn, "k", "t", "t", tie = "id")
      .select(col("l.id").as("lid"), col("r.id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fwd == Map(100L -> None, 101L -> None,
      102L -> Some(501L), 103L -> None))
  }

  test("asofJoinBackward tolerance mirrors the bounded-window join") {
    val tol = AsOf.asofJoinBackward(left, right,
        key = "k", leftTs = "t", rightTs = "t", tie = "id",
        toleranceSec = Some(1800L))
      .select(col("l.id").as("lid"), col("r.id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(tol == Map(
      100L -> Some(200L),   // 09:30, 30 min back, inclusive boundary
      101L -> Some(203L),   // equal ts
      102L -> None,
      103L -> None))
  }

  test("rangePairsBackward matches the naive range join on a randomized fixture") {
    // Deterministic pseudo-random rows across bucket boundaries: the
    // 60 s window vs 1000 s of spread exercises same-bucket,
    // adjacent-bucket, and out-of-range pairs.
    val base = ts("2024-01-01 00:00:00").getTime
    val l = (0 until 80).map { i =>
      (i.toLong, (i % 5).toLong, new Timestamp(base + (i * 7919L % 1000) * 1000L))
    }.toDF("id", "k", "t")
    val r = (0 until 120).map { i =>
      (1000L + i, (i % 5).toLong, new Timestamp(base + (i * 104729L % 1000) * 1000L), i * 1.0)
    }.toDF("id", "k", "t", "v")

    val got = AsOf.rangePairsBackward(l, r, "k", "t", "t", windowSec = 60L)
      .select(col("l.id").as("lid"), col("r.id").as("rid"))
      .as[(Long, Long)].collect().toSet

    val naive = l.as("a").join(r.as("b"),
        col("a.k") === col("b.k") &&
        col("b.t") >= col("a.t") - expr("INTERVAL 60 SECOND") &&
        col("b.t") < col("a.t"))
      .select(col("a.id").as("lid"), col("b.id").as("rid"))
      .as[(Long, Long)].collect().toSet

    assert(naive.nonEmpty, "fixture produced no in-range pairs — widen it")
    assert(got == naive)
  }

  test("asofJoinBackward plan: no join operator, one hash exchange (union rides the shuffle)") {
    val plan = AsOf.asofJoinBackward(left, right, "k", "t", "t", tie = "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$plan")
  }

  test("rangePairsBackward plan: equi-join on (key, bucket), never cartesian/nested-loop") {
    val plan = AsOf.rangePairsBackward(left, right, "k", "t", "t", windowSec = 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join must stay equi-shaped:\n$plan")
  }

  test("asofJoinBackward agrees with the naive greatest-at-or-before join") {
    val base = ts("2024-01-01 00:00:00").getTime
    val l = (0 until 60).map { i =>
      (i.toLong, (i % 4).toLong, new Timestamp(base + (i * 7919L % 500) * 1000L))
    }.toDF("id", "k", "t")
    val r = (0 until 90).map { i =>
      (1000L + i, (i % 4).toLong, new Timestamp(base + (i * 104729L % 500) * 1000L), i * 1.0)
    }.toDF("id", "k", "t", "v")

    val got = AsOf.asofJoinBackward(l, r, "k", "t", "t", tie = "id")
      .select(col("l.id").as("lid"), col("r.id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap

    val naive = l.as("a").join(r.as("b"),
        col("a.k") === col("b.k") && col("b.t") <= col("a.t"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("a.id"))
          .orderBy(col("b.t").desc_nulls_last, col("b.id").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("a.id").as("lid"), col("b.id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap

    assert(got == naive)
  }
}
