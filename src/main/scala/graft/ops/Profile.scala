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
