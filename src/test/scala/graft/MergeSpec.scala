package graft

import org.apache.spark.sql.functions._
import graft.ops.Merge

/** CDC merge/upsert (⊕): last-writer-wins compaction, I/U/D
  * application, passthrough of untouched keys, and the plan shape
  * (one window shuffle on the delta + one join — nothing else).
  */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  private val snapshot = Seq(
    (1L, "alice", 10.0),
    (2L, "bob",   20.0),
    (3L, "carol", 30.0),
    (4L, "dave",  40.0)
  ).toDF("k", "name", "bal")

  // (k, name, bal, seq, op, chg_id)
  private val changes = Seq(
    (2L, "bob_v2",   21.0, 100L, "U", 1L),
    (2L, "bob_v3",   22.0, 200L, "U", 2L),  // later seq wins
    (3L, "ignored",   0.0, 100L, "U", 1L),
    (3L, "deleted",   0.0, 200L, "D", 2L),  // latest op is delete
    (5L, "eve",      50.0, 100L, "I", 1L),  // brand-new key
    (6L, "frank_a",  60.0, 100L, "I", 1L),
    (6L, "frank_b",  61.0, 100L, "I", 2L)   // equal seq -> greater chg_id wins
  ).toDF("k", "name", "bal", "seq", "op", "chg_id")

  test("applyChanges: LWW compaction, delete, insert, passthrough") {
    val got = Merge.applyChanges(snapshot, changes, "k", "seq", "op", "chg_id")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set(
      (1L, "alice",   10.0),   // untouched
      (2L, "bob_v3",  22.0),   // latest update wins
      (4L, "dave",    40.0),   // untouched
      (5L, "eve",     50.0),   // insert of a new key
      (6L, "frank_b", 61.0)))  // equal-seq tie broken by chg_id
    // key 3 deleted
  }

  test("applyChanges is idempotent for an empty changeset") {
    val empty = changes.limit(0)
    val got = Merge.applyChanges(snapshot, empty, "k", "seq", "op", "chg_id")
      .as[(Long, String, Double)].collect().toSet
    assert(got == snapshot.as[(Long, String, Double)].collect().toSet)
  }

  test("applyChanges fails loudly on op codes outside {I,U,D}") {
    // A typo'd op must raise at execution, not silently upsert.
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + "\n" + chain(t.getCause)
    val typo = Seq((2L, "x", 1.0, 100L, "X", 1L))
      .toDF("k", "name", "bal", "seq", "op", "chg_id")
    val e1 = intercept[Throwable] {
      Merge.applyChanges(snapshot, typo, "k", "seq", "op", "chg_id").collect()
    }
    assert(chain(e1).contains("expected I|U|D"))
    // null op is equally malformed
    val nul = Seq((2L, "x", 1.0, 100L, Option.empty[String], 1L))
      .toDF("k", "name", "bal", "seq", "op", "chg_id")
    val e2 = intercept[Throwable] {
      Merge.applyChanges(snapshot, nul, "k", "seq", "op", "chg_id").collect()
    }
    assert(chain(e2).contains("expected I|U|D"))
  }

  test("upsert replaces the FULL row (no column patching)") {
    // A change row carrying a null payload column must null the
    // snapshot value, not keep it — MERGE semantics are full-row.
    val ch = Seq((1L, Option.empty[String], 11.0, 100L, "U", 1L))
      .toDF("k", "name", "bal", "seq", "op", "chg_id")
    val got = Merge.applyChanges(snapshot, ch, "k", "seq", "op", "chg_id")
      .filter(col("k") === 1L)
      .as[(Long, Option[String], Double)].collect().toList
    assert(got == List((1L, None, 11.0)))
  }

  test("scd2History: dense versions, chained intervals, one current row per key") {
    val hist = Merge.scd2History(changes, "k", "seq", "chg_id")
      .select(col("k"), col("version"), col("name"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .as[(Long, Int, String, Long, Option[Long], Boolean)]
      .collect().groupBy(_._1)
    // key 2 has two versions: bob_v2 [100, 200), bob_v3 [200, ∞)
    val k2 = hist(2L).sortBy(_._2).toList
    assert(k2.map(r => (r._2, r._3, r._4, r._5, r._6)) == List(
      (1, "bob_v2", 100L, Some(200L), false),
      (2, "bob_v3", 200L, None, true)))
    hist.values.foreach { rows =>
      // versions dense from 1 in seq order
      assert(rows.map(_._2).sorted.toList == (1 to rows.length).toList)
      // exactly one open (current) interval per key
      assert(rows.count(_._6) == 1)
      // valid_to chains to the next version's valid_from
      rows.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._5.contains(b._4))
        case _ =>
      }
    }
    // equal-seq ties (key 6) ordered by chg_id
    val k6 = hist(6L).sortBy(_._2).map(_._3).toList
    assert(k6 == List("frank_a", "frank_b"))
  }

  test("plan: one window exchange on the delta, join, no extra shuffles") {
    val plan = Merge.applyChanges(snapshot, changes, "k", "seq", "op", "chg_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // window on the changeset + (at most) the two join-side exchanges;
    // a broadcast join on a small compacted delta plans fewer.
    assert(exchanges <= 3, s"unexpected shuffle count $exchanges:\n$plan")
    assert(plan.contains("Window") || plan.contains("RunningWindowFunction"),
      s"changeset compaction must be a window:\n$plan")
  }
}
