package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ⊕ Time-series joins for event/feature alignment (north-star
  * pipeline ops beyond the reference surface): backward as-of join and
  * a banded interval ("range") join. Both are composed from built-in
  * operators so Catalyst keeps full pushdown/pruning; neither ever
  * builds a per-key cross product.
  *
  * Design for 100 TB:
  *  - [[asofJoinBackward]] is ONE shuffle on the key plus a sort within
  *    partitions (the union rides the same exchange). Cost is
  *    sort-merge-shaped — O(n log n) per partition, zero join fan-out —
  *    which is the plan you want when both sides are huge. A hot key
  *    skews its window partition, but the per-row work (running
  *    `last`) is O(1), so this is measured skew-IMMUNE up to a key
  *    owning 25% of 12M rows (`tools/SkewBench`, BASELINE.md §skew:
  *    0.9× vs uniform — the hot partition costs less than its
  *    shuffle). Pre-filter or salt upstream only if a single key's
  *    rows exceed an executor's memory.
  *  - [[rangePairsBackward]] buckets time into `windowSec`-wide epoch
  *    buckets: each right row is exploded to the ≤2 buckets it can
  *    serve, the join is a plain equi-join on (key, bucket), and the
  *    exact range predicate filters in-bucket. Candidate fan-out is
  *    bounded by per-(key, bucket) density — never |L|×|R| per key —
  *    and AQE can split a skewed bucket like any shuffle join.
  */
object AsOf {

  /** Backward as-of join: every `left` row picks the `right` row with
    * the greatest `rightTs` at-or-before its `leftTs` for the same
    * `key` (ties on the timestamp broken by the greatest `tie`, so the
    * result is deterministic), or null when no earlier right row
    * exists. With `toleranceSec`, a match further than that before the
    * left timestamp is nulled out — equivalent to bounding the match
    * window, since any other candidate is even further away.
    *
    * Returns one row per left row with two struct columns: `l` (the
    * full left row) and `r` (the matched right row, nullable).
    *
    * Implementation: tag + union both sides, then a running
    * `last(right_payload, ignoreNulls)` over
    * (key, ts, is_left, tie) — right rows sort before left rows at an
    * equal timestamp, which is exactly the inclusive at-or-before
    * semantics. This is the distributed form of the classic
    * merge-as-of: no range condition, no fan-out, one exchange.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
                       key: String, leftTs: String, rightTs: String,
                       tie: String, toleranceSec: Option[Long] = None): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, tie, forward = false, toleranceSec)

  /** Forward as-of join: the mirror of [[asofJoinBackward]] — each left
    * row picks the right row with the SMALLEST `rightTs` at-or-after
    * its `leftTs` (ties → smallest `tie`), nulled beyond
    * `toleranceSec` when set. Same single-exchange merge plan, with
    * `first(ignoreNulls)` over the forward frame.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      key: String, leftTs: String, rightTs: String,
                      tie: String, toleranceSec: Option[Long] = None): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, tie, forward = true, toleranceSec)

  private def asofImpl(left: DataFrame, right: DataFrame,
                       key: String, leftTs: String, rightTs: String,
                       tie: String, forward: Boolean,
                       toleranceSec: Option[Long]): DataFrame = {
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__is_l"),
      struct(left.columns.map(col): _*).as("l"))
    // Null-key right rows can never match under SQL join semantics
    // (and the window partition WOULD group them with null-key left
    // rows) — drop them; null-key left rows then sit in a partition
    // with no right payload and keep a null match, exactly the
    // LEFT JOIN behavior the oracle form specifies. Null-TIMESTAMP
    // right rows are dropped for the same reason: `r.ts <= l.ts` is
    // never true on null, but ascending-nulls-first ordering would
    // put them at the front of every backward frame where
    // last(ignoreNulls) could pick them up as a phantom match.
    val r = right.filter(col(key).isNotNull && col(rightTs).isNotNull).select(
      col(key).as("__k"), col(rightTs).as("__t"),
      lit(0).as("__is_l"),
      col(tie).cast("long").as("__tie"),
      struct(right.columns.map(col): _*).as("r"))
    // unionByName fills the side-specific columns (l / r / __tie) with
    // correctly-typed nulls on the other side.
    val u = l.unionByName(r, allowMissingColumns = true)
    // Inclusive at-boundary semantics: right rows at an equal timestamp
    // sort INTO the left row's frame (before it when looking back,
    // after it when looking forward); `tie` orders equal-timestamp
    // right rows so last()/first() picks the greatest/smallest id.
    val w0 = Window.partitionBy(col("__k"))
    val matched =
      if (forward)
        first(col("r"), ignoreNulls = true).over(
          w0.orderBy(col("__t").asc, col("__is_l").desc, col("__tie").asc_nulls_first)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("r"), ignoreNulls = true).over(
          w0.orderBy(col("__t").asc, col("__is_l").asc, col("__tie").asc_nulls_last)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val base = u.withColumn("r", matched).filter(col("__is_l") === 1)
    val gated = toleranceSec.fold(base) { tol =>
      val rts = col("r").getField(rightTs)
      val ok =
        if (forward) rts <= col("__t") + expr(s"INTERVAL $tol SECOND")
        else rts >= col("__t") - expr(s"INTERVAL $tol SECOND")
      base.withColumn("r", when(col("r").isNotNull && ok, col("r")))
    }
    gated.select(col("l"), col("r"))
  }

  /** Banded backward interval join: all (left, right) pairs with the
    * same `key` and `rightTs` in `[leftTs - windowSec, leftTs)`.
    * Returns struct columns `l` and `r` (both non-null — inner
    * semantics; callers wanting per-left aggregates with zeros join
    * the aggregate back onto the left side).
    *
    * Bucketing: with bucket = floor(epoch_seconds / windowSec), any
    * right row matching a left row in bucket b lies in bucket b-1 or
    * b (window width == bucket width), so the right side explodes to
    * exactly 2 (key, bucket) rows and the join is a plain equi-join —
    * the standard banded range-join reduction. A narrower band (more,
    * smaller buckets per right row) trades explode factor vs in-bucket
    * selectivity; windowSec-wide bands keep the explode at 2.
    */
  def rangePairsBackward(left: DataFrame, right: DataFrame,
                         key: String, leftTs: String, rightTs: String,
                         windowSec: Long): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val ls = left.select(
      struct(left.columns.map(col): _*).as("l"),
      col(key).as("__k"), col(leftTs).as("__lt"),
      floor(unix_seconds(col(leftTs)) / windowSec).as("__b"))
    val rb = floor(unix_seconds(col(rightTs)) / windowSec)
    val rs = right.select(
      struct(right.columns.map(col): _*).as("r"),
      col(key).as("__k"), col(rightTs).as("__rt"),
      explode(array(rb, rb + 1)).as("__b"))
    ls.join(rs, Seq("__k", "__b"))
      .filter(col("__rt") >= col("__lt") - expr(s"INTERVAL $windowSec SECOND") &&
              col("__rt") < col("__lt"))
      .select(col("l"), col("r"))
  }
}
