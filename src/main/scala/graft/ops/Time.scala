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
