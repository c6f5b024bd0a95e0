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
  * join and double-count changes.
  */
object Diff {

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
                   includeUnchanged: Boolean = false): DataFrame = {
    val payload: Seq[String] =
      (if (compareCols.nonEmpty) compareCols
       else oldDf.columns.toSeq.filterNot(_ == key)
         .intersect(newDf.columns.toSeq)).sorted
    require(payload.nonEmpty,
      s"snapshotDiff: no shared non-key columns to compare (key=$key)")
    val o = oldDf.select(col(key) +:
      payload.map(c => col(c).as(s"__o_$c")): _*).withColumn("__in_o", lit(true))
    val n = newDf.select(col(key) +:
      payload.map(c => col(c).as(s"__n_$c")): _*).withColumn("__in_n", lit(true))
    def differs(c: String): Column = !(col(s"__o_$c") <=> col(s"__n_$c"))
    // concat_ws-over-whens instead of array+filter: skips nulls in one
    // codegen'd scalar op, and split() restores the array form
    val changedCsv = concat_ws(",",
      payload.map(c => when(differs(c), lit(c))): _*)
    val out = o.join(n, Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("__in_o").isNull, lit("added"))
          .when(col("__in_n").isNull, lit("removed"))
          .when(changedCsv =!= "", lit("changed"))
          .otherwise(lit("unchanged")))
      .withColumn("changed_cols",
        when(col("change_type") === "changed", split(changedCsv, ","))
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
                compareCols: Seq[String] = Nil): DataFrame = {
    val delta = snapshotDiff(oldDf, newDf, key, compareCols)
      .filter(col("change_type").isin("added", "changed"))
      .select(col(key))
    newDf.join(delta, Seq(key), "left_semi")
  }
}
