package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X10 — `calculate_relevance_score` (`app.py:22-27`): additive score
  * over the set of discovery channels a community was found through.
  * Direct Search → +1, Relevant Post → +2, Relevant Comment → +3
  * (range 0..6). Pure column expression applied after the A2
  * `collect_set` — no UDF (the reference uses `.apply`, `app.py:67`).
  */
object Score {
  val FoundViaDirect  = "Direct Search"
  val FoundViaPost    = "Relevant Post"
  val FoundViaComment = "Relevant Comment"

  private val weights: Seq[(String, Int)] =
    Seq(FoundViaDirect -> 1, FoundViaPost -> 2, FoundViaComment -> 3)

  /** foundVia: ArrayType(StringType) column of channels. */
  def relevanceScore(foundVia: Column): Column =
    weights.map { case (channel, w) =>
      when(array_contains(foundVia, channel), w).otherwise(0)
    }.reduce(_ + _)
}
