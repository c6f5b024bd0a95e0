package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation ops A1/A2 (SURVEY.md §2.4): the reference's
  * dict-upsert community dedup (`app.py:42,51` — first occurrence
  * fixes the attributes) and set-union accumulation of discovery
  * channels (`app.py:43,52,59`).
  *
  * Scale note: both compile to `HashAggregateExec` /
  * `ObjectHashAggregateExec` with partial (map-side) aggregation, so
  * the shuffle carries one partially-reduced row per (partition, key),
  * not the raw input.
  */
object Agg {

  /** A2 — deterministic `collect_set`: sorted so output is stable
    * (Python set order is nondeterministic; documented deviation,
    * SURVEY.md §2.6 X6).
    */
  def collectSetSorted(c: Column): Column = array_sort(collect_set(c))

  /** A1 — group-by-key dedup with first-wins attributes. "First" in the
    * reference means arrival order of its sequential loop; we require an
    * explicit ordinal column to make it deterministic and distributed
    * (`min_by` = `DeclarativeAggregate`, partial-aggregatable, single
    * shuffle — unlike `first()`, which is order-dependent).
    *
    * @param ordinal  column defining arrival order (e.g. an id)
    * @param attrs    attribute columns to take from the first row
    */
  def dedupFirstWins(df: DataFrame, key: Column, ordinal: Column, attrs: Seq[Column]): DataFrame = {
    val aggs = min(ordinal).as("first_ordinal") +: attrs.map(a => min_by(a, ordinal).as(a.toString))
    df.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }
}
