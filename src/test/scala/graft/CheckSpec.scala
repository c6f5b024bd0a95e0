package graft

import org.apache.spark.sql.functions._

import graft.ops.Check
import graft.ops.Check._

class CheckSpec extends SparkSuite {
  import spark.implicits._

  // key 1..8 with planted violations of every kind
  private def data = Seq(
    (1L, Option("a@x.io"), Option(10.0), "click", 100L),
    (2L, None,             Option(20.0), "click", 101L),   // null email
    (3L, Option("b@y.io"), Option(-5.0), "view", 102L),    // below range
    (4L, Option("c@z.io"), Option(999.0), "view", 103L),   // above range
    (5L, Option("BAD"),    None,         "Error", 104L),   // regex + set + null value passes range
    (6L, Option("d@w.io"), Option(30.0), "click", 100L),   // dup ref_key? no — dup tested on ref_key
    (7L, Option("e@v.io"), Option(40.0), "click", 999L),   // orphan ref
    (8L, Option("f@u.io"), Option(50.0), "click", 101L)
  ).toDF("id", "email", "value", "etype", "ref_key")

  private def ref = Seq(100L, 101L, 102L, 103L, 104L).toDF("k")

  test("every rule type: counts, min-key samples, clean rules report zero") {
    val rep = Check.validate(data, col("id"), Seq(
        NotNull("email"), InRange("value", 0.0, 50.0),
        Matches("etype", "^[a-z]+$"), InSet("etype", Seq("click", "view")),
        Unique("ref_key"), RefIntegrity("ref_key", ref, "k"),
        NotNull("id")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(rep("not_null(email)") == ((1L, Some(2L))))
    assert(rep("in_range(value,0.0,50.0)") == ((2L, Some(3L))), "null value must pass range")
    assert(rep("matches(etype)") == ((1L, Some(5L))))
    assert(rep("in_set(etype)") == ((1L, Some(5L))))
    // ref_key 100 ×2 (ids 1,6) and 101 ×2 (ids 2,8): surplus = 2, sample = min id in dup groups
    assert(rep("unique(ref_key)") == ((2L, Some(1L))))
    assert(rep("ref_integrity(ref_key)") == ((1L, Some(7L))))
    assert(rep("not_null(id)") == ((0L, None)), "clean rule reports zero with null sample")
  }

  test("all row-local rules ride one scan; report is ordered by rule") {
    val dir = java.nio.file.Files.createTempDirectory("graft_check").toString
    data.write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    val rep = Check.validate(pq, col("id"), Seq(
      NotNull("email"), InRange("value", 0.0, 50.0),
      Matches("etype", "^[a-z]+$"), InSet("etype", Seq("click", "view"))))
    val plan = rep.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"row-local rules must share one scan, got $scans:\n$plan")
    val rules = rep.select("rule").as[String].collect().toSeq
    assert(rules == rules.sorted)
  }

  test("Matches is a FULL match: embedded-substring junk still violates; string keys survive in samples") {
    val df = Seq((10L, "a@b.io", "k-1"), (11L, "###a@b.io<junk>", "k-2"))
      .toDF("id", "email", "skey")
    val rep = Check.validate(df, col("id"),
        Seq(Matches("email", "[a-z]+@[a-z]+\\.[a-z]+")))
      .collect()(0)
    assert(rep.getLong(2) == 1L && rep.getLong(3) == 11L,
      s"find-anywhere semantics leaked: $rep")
    // string key column: type preserved, min is the sample
    val rep2 = Check.validate(df, col("skey"),
        Seq(Matches("email", "[a-z]+@[a-z]+\\.[a-z]+")))
      .collect()(0)
    assert(rep2.getString(3) == "k-2")
  }

  test("requireValid throws naming every violated rule; passes on clean data") {
    val e = intercept[IllegalArgumentException] {
      Check.requireValid(data, col("id"), Seq(NotNull("email"), Unique("ref_key")))
    }
    assert(e.getMessage.contains("not_null(email)") && e.getMessage.contains("unique(ref_key)"))
    Check.requireValid(data, col("id"), Seq(NotNull("id"), Unique("id")))
  }
}
