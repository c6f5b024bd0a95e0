package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group limits W1/W2 (SURVEY.md §2.5): the reference's
  * `subreddit.top(limit=k)` (`app.py:83`) and
  * `comments.list()[:comment_limit]` (`app.py:116`).
  *
  * Scale note: `row_number` over `Window.partitionBy(group)` is a
  * single hash-partition shuffle on the group key and streams each
  * partition once — no per-group collect. At 100 TB the shuffle is on
  * the grouping key only; skewed groups are bounded by k after the
  * rank filter, and AQE handles skewed shuffle reads. For very small k
  * over huge groups, Spark's `WindowGroupLimit` physical optimization
  * (rank-limit pushdown, enabled by default in 3.5+/4.x) keeps only k
  * rows per group per partition before the shuffle sort.
  */
object TopK {

  /** W2 — top-k rows per group by `order` (e.g. top posts by score per
    * subreddit). Deterministic iff `order` is a total order within a
    * group — callers pass tie-breakers.
    */
  def perGroupTopK(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int,
                   rankName: String = "_rn"): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankName, row_number().over(w))
      .filter(col(rankName) <= k)
      .drop(rankName)
  }

  /** W1 — first k rows per group in an explicit ordinal order (the
    * comment `flat_idx` BFS ordinal, SURVEY.md §7.4).
    */
  def perGroupHead(df: DataFrame, groupCol: Column, ordinal: Column, k: Int): DataFrame =
    perGroupTopK(df, Seq(groupCol), Seq(ordinal), k)
}
