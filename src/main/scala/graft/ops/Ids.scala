package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ⊕ Scalable stable row numbering — the 100 TB form of the
  * reference's index-reset step (SURVEY.md §2 O3: pandas
  * `reset_index` after a sort, `app.py:66` display ordering). The
  * obvious Spark translation, `row_number().over(Window.orderBy(k))`,
  * is a SINGLE-TASK global sort: every row moves through one
  * partition, which is exactly the plan that cannot exist at corpus
  * scale. This operator produces the identical contiguous 1..N
  * numbering with no single-task stage:
  *
  *  1. `repartitionByRange` on the order key — Spark's sampling-based
  *     range partitioner (the same mechanism a distributed sort
  *     uses): partition i holds keys ≤ partition j's for i < j, all
  *     partitions build in parallel;
  *  2. per-partition `row_number` over `spark_partition_id()` — the
  *     range exchange already clusters and the window sorts only
  *     within a partition;
  *  3. partition row-counts (a #partitions-row aggregate — the ONLY
  *     single-partition work is a prefix sum over that tiny table)
  *     broadcast back and added as offsets.
  *
  * Determinism: the numbering is a pure function of the order-key
  * total order, so callers must pass a TOTAL order (include a unique
  * tie-breaker key) — same contract as every `orderBy` in this repo.
  * Range-boundary ties between equal keys cannot occur under a total
  * order, so the assignment is identical on every rerun and at any
  * partition count (the spec proves invariance across 1..7).
  *
  * Use cases: contiguous example ids for a training shard manifest,
  * stable line numbers for a packed corpus, resumable offset ranges.
  */
object Ids {

  /** Contiguous 1-based row numbers in `orderCols` order, as column
    * `outCol`. One range exchange over the data + one tiny
    * (#partitions-row) aggregate; no global window over the corpus.
    *
    * @param orderCols total order (unique per row) — determinism contract
    * @param numPartitions range-partition count; defaults to the
    *        session's shuffle partitions (set
    *        [[graft.ops.Skew.partitionsForCorpus]] at real scale)
    */
  def stableRowNumber(df: DataFrame, orderCols: Seq[Column],
                      outCol: String = "row_num",
                      numPartitions: Option[Int] = None): DataFrame = {
    require(orderCols.nonEmpty, "stableRowNumber needs at least one order column")
    val n = numPartitions.getOrElse(
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val parted = df.repartitionByRange(n, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__lrn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(orderCols: _*)))
    // Partition sizes: ≤ numPartitions rows however big the corpus is.
    // The global prefix-sum window below runs over THAT table only —
    // the single-partition stage the naive plan would run over the
    // whole corpus is here bounded by the partition count.
    val offsets = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, (col("__off") + col("__lrn")).cast("long"))
      .drop("__pid", "__lrn", "__off")
  }
}
