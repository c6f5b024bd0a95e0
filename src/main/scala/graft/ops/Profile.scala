package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ One-pass column profiling (the data-quality summary a curation
  * pipeline runs before/after each stage): null count, distinct
  * count, min, max per column — ONE scan, ONE aggregate, never a
  * job per column (at 100 TB, n columns × full scans is the
  * difference between minutes and hours).
  *
  * Distinct counts: `exact = false` (default) uses HLL++ sketches —
  * a single pass with constant memory per column; `exact = true`
  * uses `countDistinct`, which Catalyst plans via Expand (row
  * multiplication per distinct column — one shuffle, exact, the
  * oracle-able form used by q51).
  */
object Profile {

  /** ⊕ Equi-width histogram of a numeric column: one single-row
    * min/max aggregate broadcast back over the scan (the q73
    * single-row-stats pattern), then a row-local bucket assignment
    * `min(buckets−1, floor((x−mn)·buckets/(mx−mn)))` and ONE hash
    * aggregation on the bucket id — two passes, no sort, no
    * collect. Nulls are excluded (they're the profiler's
    * `n_nulls`, not a bucket); a constant column lands entirely in
    * bucket 0. Bucket bounds are re-derived arithmetically so the
    * result is self-describing.
    */
  def histogram(df: DataFrame, c: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val mm = df.agg(min(c).cast("double").as("__mn"), max(c).cast("double").as("__mx"))
    df.select(c.cast("double").as("__x")).filter(col("__x").isNotNull)
      .crossJoin(broadcast(mm))
      .select(
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(lit(buckets - 1L),
            floor((col("__x") - col("__mn")) * buckets / (col("__mx") - col("__mn")))
              .cast("long"))).as("bucket"),
        col("__mn"), col("__mx"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("__mn") + col("bucket") * ((col("__mx") - col("__mn")) / buckets)), 6).as("lo"),
        round(min(col("__mn") + (col("bucket") + 1) * ((col("__mx") - col("__mn")) / buckets)), 6).as("hi"))
  }

  /** ⊕ Robust per-group outlier accounting via median/MAD — the
    * data-quality gate that survives heavy tails where mean/stddev
    * break (a single corrupt value drags a z-score gate, but not the
    * median): per group, `med = median(x)`, `mad = median(|x − med|)`,
    * outlier ⇔ `|x − med| > k·mad`. A zero MAD (>50% of the group at
    * one value) flags EVERY row off the median — the strict
    * convention, documented and mirrored. Two grouped exact
    * percentiles (sort-based within group) + one broadcast join back;
    * output is one row per group, never row-level.
    */
  def madOutliers(df: DataFrame, group: Column, value: Column,
                  k: Double = 3.0, roundTo: Int = 4): DataFrame = {
    val base = df.select(group.as("g"), value.cast("double").as("x"))
      .filter(col("x").isNotNull)
    val med = base.groupBy(col("g"))
      .agg(percentile(col("x"), lit(0.5)).as("__med"))
    val withMed = base.join(broadcast(med), "g")
    val mad = withMed.groupBy(col("g"))
      .agg(percentile(abs(col("x") - col("__med")), lit(0.5)).as("__mad"))
    withMed.join(broadcast(mad), "g")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        round(min(col("__med")), roundTo).as("med"),
        round(min(col("__mad")), roundTo).as("mad"),
        sum(when(abs(col("x") - col("__med")) > lit(k) * col("__mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  def summarize(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "Profile.summarize needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"distinct_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
