package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.functions._

/** Spill path of the two typed `Aggregator`s (TopKByWeight q47,
  * FreqItems q77): both run under ObjectHashAggregate, whose 100 TB
  * failure mode is the sort-based fallback that kicks in when the
  * in-memory hash map exceeds
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` — a
  * path no small-scale run exercises naturally. Force the threshold
  * to 2 and assert results are IDENTICAL to the hash path, and that
  * the fallback really engaged (numTasksFallBacked metric > 0).
  */
class AggregatorFallbackSpec extends SparkSuite {
  import spark.implicits._

  private val ThresholdKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  /** Build + collect `ds` with the fallback threshold forced to 2
    * (AQE off so executedPlan metrics are directly inspectable);
    * returns the rows and the total fallback-task count. The metric
    * is read from the SAME Dataset that was collected — a derived
    * Dataset would carry a fresh, never-executed queryExecution.
    */
  private def withForcedFallback[T](build: => Dataset[T]): (Set[T], Long) = {
    val oldThreshold = spark.conf.getOption(ThresholdKey)
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set(ThresholdKey, "2")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ds = build
      val rows = ds.collect().toSet
      val fallbacks = objHashNodes(ds.queryExecution.executedPlan)
        .map(_.metrics("numTasksFallBacked").value).sum
      (rows, fallbacks)
    } finally {
      oldThreshold match {
        case Some(v) => spark.conf.set(ThresholdKey, v)
        case None => spark.conf.unset(ThresholdKey)
      }
      spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }

  private def objHashNodes(p: SparkPlan): Seq[ObjectHashAggregateExec] =
    p.collect { case o: ObjectHashAggregateExec => o }

  test("TopKByWeight: sort-based fallback returns identical results") {
    // 60 groups per partition >> threshold 2 -> every task falls back
    val data = (1 to 2400).map(i => (s"g${i % 60}", i.toLong, (i * 37 % 101).toDouble))
    def query = data.toDF("g", "id", "w").repartition(4)
      .groupBy(col("g"))
      .agg(functions.TopKByWeight.topK(3)(col("id"), col("w")).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.id"), col("e.w"))
      .as[(String, Long, Double)]
    val reference = query.collect().toSet
    val (fallen, nFallbacks) = withForcedFallback(query)
    assert(nFallbacks > 0, "fallback threshold 2 did not trigger sort-based aggregation")
    assert(fallen == reference)
    // and the window-pattern ground truth agrees
    val viaWindow = ops.TopK.perGroupTopK(data.toDF("g", "id", "w"),
        Seq(col("g")), Seq(desc("w"), asc("id")), 3)
      .as[(String, Long, Double)].collect().toSet
    assert(fallen == viaWindow)
  }

  test("FreqItems: sort-based fallback is exact in exact mode, bounded under overflow") {
    // Exact mode (distinct keys per group <= capacity): the summary is
    // a deterministic exact count map, so hash path and fallback path
    // must agree item-for-item.
    val exactData = (1 to 4000).map(i => (s"g${i % 40}", s"k${i % 7}"))
    def exactQuery = exactData.toDF("g", "k").repartition(4)
      .groupBy(col("g"))
      .agg(functions.FreqItems.freqItems(8)(col("k")).as("fi"))
      .select(col("g"), explode(col("fi")).as("x"))
      .select(col("g"), col("x.item"), col("x.est"))
      .as[(String, String, Long)]
    val reference = exactQuery.collect().toSet
    val (fallen, nFallbacks) = withForcedFallback(exactQuery)
    assert(nFallbacks > 0, "fallback threshold 2 did not trigger sort-based aggregation")
    assert(fallen == reference)

    // Overflow mode: WHICH est=1 tail items survive is merge-order-
    // sensitive by Misra-Gries design (the fallback changes merge
    // order), so assert the MG guarantees instead of equality:
    // undercount bound + every heavy key present, per group.
    val skewed = (1 to 4000).map { i =>
      val k = if (i % 3 == 0) "hot" else s"cold${i % 97}"
      (s"g${i % 8}", k)
    }
    def skewQuery = skewed.toDF("g", "k").repartition(4)
      .groupBy(col("g"))
      .agg(functions.FreqItems.freqItems(8)(col("k")).as("fi"))
      .select(col("g"), explode(col("fi")).as("x"))
      .select(col("g"), col("x.item"), col("x.est"))
      .as[(String, String, Long)]
    val (got, nFallbacks2) = withForcedFallback(skewQuery)
    assert(nFallbacks2 > 0, "fallback threshold 2 did not trigger sort-based aggregation")
    val truth = skewed.groupBy(_._1).view.mapValues(
      _.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    val perGroup = got.groupBy(_._1)
    for ((g, items) <- perGroup) {
      val n = truth(g).values.sum
      assert(items.size <= 8)
      items.foreach { case (_, k, est) =>
        assert(est <= truth(g)(k), s"$g/$k overcounted under fallback")
        assert(est >= truth(g)(k) - n / 9, s"$g/$k undercounted beyond bound")
      }
      truth(g).collect { case (k, c) if c > n / 9 => k }
        .foreach(k => assert(items.exists(_._2 == k), s"heavy key $g/$k missing"))
    }
  }
}
