package graft

import org.apache.spark.sql.functions._
import graft.ops.Diff

/** [[graft.ops.Diff]] — snapshot diff / incremental reprocessing. */
class DiffSpec extends SparkSuite {
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "name", "bal")
  private def newSnap = Seq(
    (1L, "a", 10.0),          // unchanged
    (2L, "b2", 20.0),         // name changed
    (3L, "c", 33.0),          // bal changed
    (5L, "e", 50.0))          // added; 4 removed
    .toDF("k", "name", "bal")

  test("snapshotDiff classifies added/removed/changed with column attribution") {
    val got = Diff.snapshotDiff(oldSnap, newSnap, "k")
      .select($"k", $"change_type", concat_ws(",", $"changed_cols").as("cc"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (2L, "changed", "name"),
      (3L, "changed", "bal"),
      (4L, "removed", ""),
      (5L, "added", "")))
  }

  test("includeUnchanged adds the unchanged row; multi-column changes list alphabetically") {
    val n2 = newSnap.withColumn("bal", when($"k" === 2L, 99.0).otherwise($"bal"))
    val all = Diff.snapshotDiff(oldSnap, n2, "k", includeUnchanged = true)
    assert(all.count() == 5)
    val r2 = all.filter($"k" === 2L)
      .select(concat_ws(",", $"changed_cols")).as[String].head()
    assert(r2 == "bal,name") // alphabetical, not snapshot order
    assert(all.filter($"change_type" === "unchanged").select($"k").as[Long].head() == 1L)
  }

  test("null-safe comparison: null==null is unchanged, null→value is changed") {
    val o = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "name")
    val n = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("k", "name")
    val got = Diff.snapshotDiff(o, n, "k", includeUnchanged = true)
      .select($"k", $"change_type").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "unchanged"), (2L, "changed")))
  }

  test("schema drift between versions: one-sided columns are ignored, not fatal") {
    val o = oldSnap.withColumn("legacy", lit(1))
    val n = newSnap.withColumn("brand_new", lit(2))
    // compares only {name, bal}; legacy/brand_new silently out of scope
    val got = Diff.snapshotDiff(o, n, "k")
    assert(got.filter($"change_type" === "changed").count() == 2)
  }

  test("staleRows returns exactly the added∪changed rows of the new snapshot") {
    val got = Diff.staleRows(oldSnap, newSnap, "k")
      .select($"k").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 3L, 5L))
    // rows come from the NEW snapshot (post-change payloads)
    val bal3 = Diff.staleRows(oldSnap, newSnap, "k")
      .filter($"k" === 3L).select($"bal").as[Double].head()
    assert(bal3 == 33.0)
  }

  test("duplicate keys throw by default, naming the key and offender") {
    val dupNew = newSnap.union(Seq((5L, "e-dup", 51.0)).toDF("k", "name", "bal"))
    val ex = intercept[Exception] {
      Diff.snapshotDiff(oldSnap, dupNew, "k").collect()
    }
    // Spark wraps the assert_true failure; the message must surface
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("duplicate key") && msg.contains("k=5"),
      s"expected a named duplicate-key error, got: $msg")
  }

  test("assumeUniqueKeys opts out of the guard (pre-validated snapshots)") {
    val dupNew = newSnap.union(Seq((5L, "e-dup", 51.0)).toDF("k", "name", "bal"))
    // fans out as documented — caller took responsibility
    val n = Diff.snapshotDiff(oldSnap, dupNew, "k", assumeUniqueKeys = true).count()
    assert(n >= 4)
  }

  test("changed_cols survives a column name containing a comma") {
    val o = Seq((1L, "x", "y")).toDF("k", "a,b", "c")
    val n = Seq((1L, "x2", "y")).toDF("k", "a,b", "c")
    val got = Diff.snapshotDiff(o, n, "k")
      .select($"changed_cols").as[Seq[String]].head()
    assert(got == Seq("a,b"))
  }

  test("bucketed fast path: identical delta, unchanged buckets never read") {
    val rows = (1L to 400L).map(k => (k, s"name_$k", k * 1.5))
    // one modified payload + one added key; everything else identical,
    // written in identical order so unchanged buckets are byte-equal
    val rows2 = rows.map { case (k, nm, b) =>
      if (k == 7L) (k, "name_7_CHANGED", b) else (k, nm, b)
    } :+ (401L, "name_401", 601.5)
    spark.sql("DROP TABLE IF EXISTS diff_old")
    spark.sql("DROP TABLE IF EXISTS diff_new")
    graft.sinks.Bucketed.write(rows.toDF("k", "name", "bal").coalesce(1),
      "diff_old", "k", buckets = 4)
    graft.sinks.Bucketed.write(rows2.toDF("k", "name", "bal").coalesce(1),
      "diff_new", "k", buckets = 4)

    val bd = Diff.snapshotDiffBucketed(spark, "diff_old", "diff_new", "k")
    val fast = bd.diff
      .select($"k", $"change_type", concat_ws(",", $"changed_cols"))
      .as[(Long, String, String)].collect().toSet
    val slow = Diff.snapshotDiff(spark.table("diff_old"), spark.table("diff_new"), "k")
      .select($"k", $"change_type", concat_ws(",", $"changed_cols"))
      .as[(Long, String, String)].collect().toSet
    assert(fast == slow)
    assert(fast.contains((7L, "changed", "name")) && fast.contains((401L, "added", "")))
    // pruning evidence: only the churned buckets' files were read
    assert(bd.totalBuckets == 4)
    assert(bd.changedBuckets.nonEmpty && bd.changedBuckets.size <= 2,
      s"expected <=2 churned buckets, got ${bd.changedBuckets}")
    assert(bd.prunedFiles > 0 && bd.prunedFiles + bd.diff.inputFiles.length == bd.totalFiles,
      s"pruned=${bd.prunedFiles} read=${bd.diff.inputFiles.length} total=${bd.totalFiles}")
  }

  test("bucketed fast path refuses mismatched layouts (wrong key, unequal counts, unbucketed)") {
    spark.sql("DROP TABLE IF EXISTS diff_bad")
    (1L to 10L).map(k => (k, s"n$k")).toDF("k", "name")
      .write.mode("overwrite").saveAsTable("diff_bad")
    val e1 = intercept[IllegalArgumentException] {
      Diff.snapshotDiffBucketed(spark, "diff_bad", "diff_bad", "k")
    }
    assert(e1.getMessage.contains("not bucketed"))
    spark.sql("DROP TABLE IF EXISTS diff_b8")
    graft.sinks.Bucketed.write((1L to 10L).map(k => (k, s"n$k")).toDF("k", "name"),
      "diff_b8", "k", buckets = 8)
    spark.sql("DROP TABLE IF EXISTS diff_b4")
    graft.sinks.Bucketed.write((1L to 10L).map(k => (k, s"n$k")).toDF("k", "name"),
      "diff_b4", "k", buckets = 4)
    val e2 = intercept[IllegalArgumentException] {
      Diff.snapshotDiffBucketed(spark, "diff_b8", "diff_b4", "k")
    }
    assert(e2.getMessage.contains("bucket counts differ"))
    val e3 = intercept[IllegalArgumentException] {
      Diff.snapshotDiffBucketed(spark, "diff_b8", "diff_b8", "name")
    }
    assert(e3.getMessage.contains("not by diff key"))
  }

  test("delta output is O(delta): one full-outer join, no extra shuffle stages") {
    val plan = Diff.snapshotDiff(oldSnap, newSnap, "k")
      .queryExecution.executedPlan.toString
    // exactly one join; comparison is row-local projection over it
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).size == 1, s"expected a single join:\n$plan")
  }
}
