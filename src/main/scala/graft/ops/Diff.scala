package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ Snapshot diff — classify every key across two versions of a
  * corpus as added / removed / changed / unchanged, with column-level
  * change attribution. The inverse of [[Merge.applyChanges]] (which
  * folds a change log INTO a snapshot, this derives the change log
  * FROM two snapshots), and the primitive behind incremental
  * reprocessing: at 100 TB you re-run the expensive downstream stages
  * (dedup, embedding, quality scoring) over `added ∪ changed` only,
  * never the unchanged bulk.
  *
  * Scale shape: ONE full-outer equi-join on the key — each side
  * shuffles once on the key hash; with both snapshots bucketed by the
  * key (the layout [[graft.sinks.Layout]] writes and ScaleSpec's CDC
  * merge proves exchange-free) the join plans with zero Exchange.
  * Payload comparison is row-local null-safe equality per column —
  * no second pass, no driver state — and with the default
  * `includeUnchanged = false` the output is O(|delta|), which is the
  * whole point: a 0.1% daily churn on 100 TB yields a 100 GB diff,
  * not a second copy of the corpus.
  *
  * Requires `key` to be unique within each snapshot (it is a snapshot
  * key, not an event key); duplicate keys would fan out the full-outer
  * join and double-count changes. That requirement is ENFORCED by
  * default: each side carries a window count over the key and any
  * count > 1 raises at execution time naming the key and the first
  * offending value (`assumeUniqueKeys = true` skips the check for
  * pre-validated snapshots). The check shares the join's hash
  * partitioning on the key, so it costs a sort, not a shuffle.
  */
object Diff {

  /** Append a lazy uniqueness assertion on `key`: a window count over
    * the key (same hash partitioning the downstream join needs — no
    * extra Exchange) feeds an `assert_true` that names the side, the
    * key column, and the offending value. Kept in a Filter so column
    * pruning can't drop it.
    */
  private def requireUniqueKey(df: DataFrame, key: String, side: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    df.withColumn("__kc", count(lit(1)).over(w))
      .filter(assert_true(col("__kc") <= 1,
        concat(lit(s"snapshotDiff: duplicate key in $side snapshot: $key="),
          col(key).cast("string"), lit(" appears "),
          col("__kc").cast("string"), lit(" times"))).isNull)
      .drop("__kc")
  }

  /** Diff `newDf` against `oldDf` on `key`.
    *
    * Output: `key`, `change_type` ('added' | 'removed' | 'changed' |
    * 'unchanged'), `changed_cols` (array of column names whose values
    * differ under null-safe equality, in alphabetical order; empty
    * unless `change_type = 'changed'`).
    *
    * `compareCols` defaults to every non-key column present in BOTH
    * snapshots (schema drift between versions is thus tolerated: a
    * column only one side carries can't be compared row-by-row and is
    * ignored rather than crashing the diff — the S5 tolerance stance).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
                   compareCols: Seq[String] = Nil,
                   includeUnchanged: Boolean = false,
                   assumeUniqueKeys: Boolean = false): DataFrame = {
    val payload: Seq[String] =
      (if (compareCols.nonEmpty) compareCols
       else oldDf.columns.toSeq.filterNot(_ == key)
         .intersect(newDf.columns.toSeq)).sorted
    require(payload.nonEmpty,
      s"snapshotDiff: no shared non-key columns to compare (key=$key)")
    val oChecked = if (assumeUniqueKeys) oldDf else requireUniqueKey(oldDf, key, "old")
    val nChecked = if (assumeUniqueKeys) newDf else requireUniqueKey(newDf, key, "new")
    val o = oChecked.select(col(key) +:
      payload.map(c => col(c).as(s"__o_$c")): _*).withColumn("__in_o", lit(true))
    val n = nChecked.select(col(key) +:
      payload.map(c => col(c).as(s"__n_$c")): _*).withColumn("__in_n", lit(true))
    def differs(c: String): Column = !(col(s"__o_$c") <=> col(s"__n_$c"))
    // array-of-whens + filter builds changed_cols directly — a column
    // name containing a comma (or any delimiter) round-trips intact,
    // where a concat_ws/split pair would silently mis-split it
    val changedArr = filter(
      array(payload.map(c => when(differs(c), lit(c))): _*), _.isNotNull)
    val out = o.join(n, Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("__in_o").isNull, lit("added"))
          .when(col("__in_n").isNull, lit("removed"))
          .when(size(changedArr) > 0, lit("changed"))
          .otherwise(lit("unchanged")))
      .withColumn("changed_cols",
        when(col("change_type") === "changed", changedArr)
          .otherwise(array().cast("array<string>")))
      .select(col(key), col("change_type"), col("changed_cols"))
    if (includeUnchanged) out else out.filter(col("change_type") =!= "unchanged")
  }

  /** The incremental-reprocessing driver: the `added ∪ changed` rows
    * of `newDf`, i.e. exactly the keys whose downstream derivations
    * are stale. Composes [[snapshotDiff]] with a semi-join back to the
    * new snapshot (same key partitioning — AQE reuses the exchange).
    */
  def staleRows(oldDf: DataFrame, newDf: DataFrame, key: String,
                compareCols: Seq[String] = Nil,
                assumeUniqueKeys: Boolean = false): DataFrame = {
    val delta = snapshotDiff(oldDf, newDf, key, compareCols,
        includeUnchanged = false, assumeUniqueKeys = assumeUniqueKeys)
      .filter(col("change_type").isin("added", "changed"))
      .select(col(key))
    newDf.join(delta, Seq(key), "left_semi")
  }
}
