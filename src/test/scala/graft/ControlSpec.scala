package graft

import org.apache.spark.sql.functions._
import graft.ops.Control
import graft.pipelines.SignalScan
import graft.sources.Tables

/** Session-layer surface: cancellation, progress, result cache,
  * tolerant reads, presets, sketch accuracy (SURVEY.md §3.4, §2.1 S5/S8,
  * §2.6 X12, §2.4 A6).
  */
class ControlSpec extends SparkSuite {

  test("runCancellable: cancel aborts the job group") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val fut = Future {
      Control.runCancellable(spark, "slow-scan") {
        spark.range(1L << 42).groupBy(col("id") % 97).count().collect()
      }
    }
    // Cancel repeatedly until the job dies — a single cancel can race
    // job submission (planning happens before any job exists to kill).
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!fut.isCompleted && System.nanoTime() < deadline) {
      Control.cancel(spark, "slow-scan")
      Thread.sleep(250)
    }
    val err = intercept[Exception](Await.result(fut, 10.seconds))
    assert(err.getMessage != null)
  }

  test("withTaskProgress observes task completions") {
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val l = Control.withTaskProgress(spark.sparkContext)(n => seen.set(n))
    try {
      spark.range(1000).repartition(4).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.get() < 4 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.get() >= 4)
    } finally Control.removeListener(spark.sparkContext, l)
  }

  test("S8 cacheResult: persists and registers a view keyed by sorted params") {
    val df = Tables.orders(spark, sfDir).limit(10)
    val cached = Tables.cacheResult(df, "audience", Seq("b query", "a query"))
    try {
      assert(cached.storageLevel.useMemory)
      val viaView = spark.table("audience_a_query_b_query")
      assert(viaView.count() == 10)
    } finally cached.unpersist()
  }

  test("S8 TTL: entry expires lazily on access at exactly ttl (injected clock)") {
    val df = Tables.orders(spark, sfDir).limit(5)
    var t = 1000L
    val clock = () => t
    Tables.cacheResultWithTtl(df, "aud_ttl", Seq("q"), ttlSeconds = 3600, now = clock)
    assert(Tables.cachedResult(spark, "aud_ttl", Seq("q"), clock).isDefined)
    t += 3599 * 1000L   // 1s before the deadline: still served
    assert(Tables.cachedResult(spark, "aud_ttl", Seq("q"), clock).isDefined)
    assert(spark.table("aud_ttl_q").count() == 5)
    t += 1000L          // exactly ttl after creation: evicted on read
    assert(Tables.cachedResult(spark, "aud_ttl", Seq("q"), clock).isEmpty)
    // eviction dropped the temp view and stays evicted
    assert(intercept[Exception](spark.table("aud_ttl_q")).getMessage != null)
    assert(Tables.cachedResult(spark, "aud_ttl", Seq("q"), clock).isEmpty)
  }

  test("S8 TTL: re-caching a live key unpersists the replaced entry; huge ttl never overflows") {
    var t = 1000L
    val clock = () => t
    val first = Tables.cacheResultWithTtl(
      Tables.orders(spark, sfDir).limit(3), "aud_swap", Seq("q"),
      ttlSeconds = 3600, now = clock)
    assert(first.storageLevel.useMemory)
    val second = Tables.cacheResultWithTtl(
      Tables.orders(spark, sfDir).limit(4), "aud_swap", Seq("q"),
      ttlSeconds = 3600, now = clock)
    try {
      // the displaced entry's persisted blocks are released, not leaked
      assert(first.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      assert(spark.table("aud_swap_q").count() == 4)
      // a large non-sentinel ttl must not overflow ttl*1000 into instant expiry
      Tables.cacheResultWithTtl(
        Tables.orders(spark, sfDir).limit(2), "aud_big", Seq("q"),
        ttlSeconds = Long.MaxValue / 2, now = clock)
      t += 86400L * 1000L
      assert(Tables.cachedResult(spark, "aud_big", Seq("q"), clock).isDefined)
    } finally {
      second.unpersist()
      Tables.cachedResult(spark, "aud_big", Seq("q"), clock).foreach(_.unpersist())
    }
  }

  test("S5 readTolerant: scan skips corrupt files in the directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tolerant")
    val good = Tables.orders(spark, sfDir).limit(7)
    good.write.mode("overwrite").parquet(s"$dir/data")
    // plant a corrupt "parquet" file next to the real ones
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/data/part-corrupt.parquet"),
      "this is not parquet".getBytes)
    val df = Tables.readTolerant(spark, Some(good.schema), s"$dir/data")
    assert(df.count() == 7)
  }

  test("X12 presets match the reference budgets") {
    assert(SignalScan.presets("Fast") == ((10, 20)))
    assert(SignalScan.presets("Standard") == ((50, 100)))
    assert(SignalScan.presets("Deep") == ((100, 500)))
    val p = SignalScan.paramsForPreset("unknown", Seq("x"), Seq("k"))
    assert(p.postLimit == 50 && p.commentLimit == 100)
  }

  test("A6 approx_count_distinct within default rsd of exact") {
    // q34 emits (flag, exact_parts, exact_supps, approx_parts_ok,
    // approx_supps_ok): the 3·rsd bound check runs inside the query so
    // the oracle can hash-compare it; here we assert it held.
    val rows = SparkEntry.queries("q34_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getBoolean(3), s"approx_parts out of bounds for ${r.getString(0)}")
      assert(r.getBoolean(4), s"approx_supps out of bounds for ${r.getString(0)}")
    }
  }

  test("withObservedMetrics: metric aggregates ride the consuming action, no second scan") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val (instrumented, obs) = Control.withObservedMetrics(li, "li_metrics",
      count(lit(1)).as("rows"),
      round(sum(col("l_quantity")), 2).as("qty"))
    // one action drives both the query and the metrics
    val selected = instrumented.filter(col("l_quantity") >= 25).count()
    val m = obs.get
    val expectedRows = li.count()
    val expectedQty = li.agg(round(sum(col("l_quantity")), 2)).head.getDouble(0)
    assert(m("rows") == expectedRows)   // metrics see ALL rows pre-filter
    // two independent jobs sum doubles in different partition orders;
    // compare within a rounding step rather than exactly
    assert(math.abs(m("qty").asInstanceOf[Double] - expectedQty) <= 0.02,
      s"qty ${m("qty")} vs $expectedQty")
    assert(selected > 0 && selected < expectedRows)
  }
}
