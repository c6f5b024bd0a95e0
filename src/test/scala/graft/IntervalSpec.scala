package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Interval

class IntervalSpec extends SparkSuite {
  import spark.implicits._

  // (id, key, startSec, endSec) → DataFrame with timestamp bounds
  private def iv(rows: (Long, String, Long, Long)*): DataFrame =
    rows.toSeq.toDF("id", "k", "s", "e")
      .select(col("id"), col("k"),
        timestamp_seconds(col("s")).as("start_ts"),
        timestamp_seconds(col("e")).as("end_ts"))

  private def pairs(l: DataFrame, r: DataFrame, chunkSec: Long = 10,
                    maxChunks: Int = 1024): Set[(Long, Long)] =
    Interval.overlapPairs(l, r, "k", "start_ts", "end_ts", "start_ts", "end_ts",
        chunkSec, maxChunks)
      .select(col("l.id"), col("r.id")).as[(Long, Long)].collect().toSet

  test("hand-computed overlaps: containment, partial, touching endpoints, disjoint") {
    val l = iv((1, "a", 100, 200), (2, "a", 300, 310), (3, "a", 500, 500))
    val r = iv(
      (10, "a", 150, 160),  // contained in 1
      (11, "a", 190, 250),  // partial with 1
      (12, "a", 200, 290),  // touches 1 at exactly 200 (closed: overlap)
      (13, "a", 201, 299),  // disjoint from everything
      (14, "a", 490, 500))  // touches point-interval 3
    assert(pairs(l, r) == Set((1L, 10L), (1L, 11L), (1L, 12L), (3L, 14L)))
  }

  test("each pair is emitted exactly once even when the overlap spans many chunks") {
    val l = iv((1, "a", 0, 95))
    val r = iv((2, "a", 5, 90))   // overlap [5,90] covers ~9 chunks of 10s
    val df = Interval.overlapPairs(iv((1, "a", 0, 95)), iv((2, "a", 5, 90)),
      "k", "start_ts", "end_ts", "start_ts", "end_ts", 10)
    assert(df.count() == 1L, "first-overlapping-chunk rule must dedup without distinct")
    assert(pairs(l, r) == Set((1L, 2L)))
  }

  test("keys isolate; degenerate and null-bounded intervals are dropped") {
    val l = iv((1, "a", 0, 100), (2, "b", 0, 100), (3, "a", 50, 40)) // 3 is empty
    val r = iv((10, "a", 50, 60), (11, "b", 200, 300))
    assert(pairs(l, r) == Set((1L, 10L)))
    val withNull = l.withColumn("start_ts",
      when(col("id") === 1, lit(null).cast("timestamp")).otherwise(col("start_ts")))
    assert(pairs(withNull, r).isEmpty)
  }

  test("an interval spanning more than maxChunksPerInterval chunks fails loudly") {
    val l = iv((1, "a", 0, 1000))  // 101 chunks of 10s
    val r = iv((2, "a", 5, 15))
    val e = intercept[Exception] {
      pairs(l, r, chunkSec = 10, maxChunks = 100)
    }
    assert(e.getMessage != null && e.getMessage.contains("overlapPairs"),
      s"expected the loud guard, got: ${e.getMessage}")
  }

  test("matches the naive inequality join on the fixture slice; no nested-loop join in the plan") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    def side(tpe: String, mod: Int) = ev.filter(col("event_type") === tpe)
      .select(col("event_id").as("id"), col("user_id").as("k"), col("ts").as("start_ts"),
        expr(s"timestampadd(SECOND, CAST(event_id % $mod AS INT), ts)").as("end_ts"))
    val l = side("view", 5000)
    val r = side("click", 8000)
    val chunked = Interval.overlapPairs(l, r, "k", "start_ts", "end_ts",
        "start_ts", "end_ts", chunkSec = 3600)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    val naive = l.as("a").join(r.as("b"),
        col("a.k") === col("b.k") &&
        unix_seconds(col("a.start_ts").cast("timestamp")) <= unix_seconds(col("b.end_ts").cast("timestamp")) &&
        unix_seconds(col("b.start_ts").cast("timestamp")) <= unix_seconds(col("a.end_ts").cast("timestamp")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    assert(chunked.except(naive).isEmpty && naive.except(chunked).isEmpty)
    val plan = chunked.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"chunked overlap join must be an equi-join:\n$plan")
  }
}
