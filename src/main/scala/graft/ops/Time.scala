package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X13 — the reference's `time_filter ∈ {all, day, week, month, year}`
  * enum (`app.py:256,47,83`) as an engine-side predicate builder. The
  * reference delegates the window to the API server-side; we define
  * the deltas explicitly (month = 30 days, year = 365 days — fixed
  * spans, not calendar arithmetic, so the predicate stays a constant
  * range comparison the scan can push down).
  */
object Time {

  private val spans: Map[String, String] = Map(
    "day"   -> "INTERVAL 1 DAY",
    "week"  -> "INTERVAL 7 DAYS",
    "month" -> "INTERVAL 30 DAYS",
    "year"  -> "INTERVAL 365 DAYS")

  /** Predicate `ts >= now - span(filter)`; `"all"` → always true.
    * `now` is an explicit column (pass a literal timestamp) so plans
    * stay deterministic and cache-stable — never `current_timestamp`
    * buried in the operator.
    */
  def timeFilter(ts: Column, filter: String, now: Column): Column =
    filter match {
      case "all" => lit(true)
      case f =>
        val span = spans.getOrElse(f,
          throw new IllegalArgumentException(
            s"unknown time_filter '$f' (expected ${("all" +: spans.keys.toSeq.sorted).mkString("/")})"))
        ts >= (now - expr(span))
    }

  /** ⊕ Trailing time-window frame for rolling per-key features
    * (rolling counts/sums over "the last `spanSec` seconds" — the
    * standard session/feature-engineering aggregate): a RANGE frame
    * over integral epoch seconds, `[ts - spanSec, ts]` inclusive.
    *
    * Takes the ORDER column as epoch seconds (e.g.
    * `unix_seconds(col("ts"))`) rather than a timestamp: integral
    * range frames are engine-portable (no interval arithmetic inside
    * the frame spec) and make the peer-row semantics exact. One
    * shuffle on the partition key; within a partition the frame is
    * evaluated by a single ordered scan.
    */
  def trailingWindow(partition: Column, epochSeconds: Column,
                     spanSec: Long): org.apache.spark.sql.expressions.WindowSpec = {
    require(spanSec >= 0, s"spanSec must be non-negative, got $spanSec")
    org.apache.spark.sql.expressions.Window
      .partitionBy(partition)
      .orderBy(epochSeconds.asc)
      .rangeBetween(-spanSec, org.apache.spark.sql.expressions.Window.currentRow)
  }

  /** ⊕ Exponential time-decay score per key: at each event,
    * `score = Σ_{i ≤ now} value_i · exp(−λ·(t_now − t_i))` — the
    * standard recency-weighted engagement/feature signal.
    *
    * The naive form recomputes the whole weighted sum per row (O(n²)
    * per key, and SQL window aggregates can't reference the current
    * row's timestamp inside the frame anyway). The algebraic
    * reformulation `exp(−λ·t_now) · Σ value_i · exp(λ·t_i)` turns it
    * into ONE running window sum over `u_i = value_i·exp(λ·t_i)` —
    * one shuffle on the key, one ordered pass per partition, O(n).
    *
    * `tRef` rebases timestamps (days since a fixed epoch) so
    * `exp(λ·t)` stays in range — with raw epoch seconds the inner
    * terms overflow double. λ is per `tUnit` of the rebased axis.
    */
  def decayedScore(partition: Column, t: Column, tie: Column, value: Column,
                   lambda: Double): Column = {
    require(lambda > 0, s"lambda must be positive, got $lambda")
    // (t, tie) is a TOTAL order: with a ROWS frame, equal-t rows would
    // otherwise receive order-dependent prefix sums
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partition).orderBy(t.asc, tie.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    exp(t * -lambda) * sum(value * exp(t * lambda)).over(w)
  }

  /** The lower bound itself (for APIs that want a `sinceTs` value,
    * e.g. [[graft.pipelines.SignalScan.Params]]); None for `"all"`.
    */
  def sinceTs(filter: String, now: java.sql.Timestamp): Option[java.sql.Timestamp] =
    filter match {
      case "all" => None
      case f =>
        val days = f match {
          case "day" => 1L; case "week" => 7L; case "month" => 30L
          case "year" => 365L
          case other => throw new IllegalArgumentException(
            s"unknown time_filter '$other' (expected all/day/month/week/year)")
        }
        Some(new java.sql.Timestamp(now.getTime - days * 86400000L))
    }
}
