package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** ⊕ Scalable stable row numbering — the 100 TB form of the
  * reference's index-reset step (SURVEY.md §2 O3: pandas
  * `reset_index` after a sort, `app.py:66` display ordering). The
  * obvious Spark translation, `row_number().over(Window.orderBy(k))`,
  * is a SINGLE-TASK global sort: every row moves through one
  * partition, which is exactly the plan that cannot exist at corpus
  * scale. This operator produces the identical contiguous 1..N
  * numbering with no single-task stage, on the canonical
  * `zipWithIndex` construction (the same two-pass shape Spark's own
  * `RDD.zipWithIndex` uses):
  *
  *  1. `repartitionByRange` + `sortWithinPartitions` on the order key
  *     — Spark's sampling-based range partitioner (the distributed
  *     sort mechanism): partition i's keys precede partition j's for
  *     i < j, all partitions sort in parallel;
  *  2. one lightweight count job collects the per-partition sizes
  *     (#partitions longs of driver state — the centroid-collect
  *     bound) over the SAME materialized shuffle output (shuffle
  *     files are reused across jobs, so the exchange runs once and
  *     there is exactly one boundary sample — no divergent-branch
  *     risk and nothing to persist);
  *  3. the zip pass adds `offset(partition) + local index`.
  *
  * This is deliberately the RDD escape hatch the repo otherwise
  * avoids: per-partition stateful indexing is genuine imperative
  * per-partition logic, and the window-based alternative pays a
  * SECOND corpus-wide exchange (hash on the partition id) for the
  * same result.
  *
  * Determinism: the numbering is a pure function of the order-key
  * total order, so callers must pass a TOTAL order (include a unique
  * tie-breaker key) — the repo-wide `orderBy` contract. The spec
  * proves value-equality with the naive global window and invariance
  * across partition counts.
  *
  * Use cases: contiguous example ids for a training shard manifest,
  * stable line numbers for a packed corpus, resumable offset ranges.
  */
object Ids {

  /** Contiguous 1-based row numbers in `orderCols` order, as column
    * `outCol`.
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
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    // RDD.zipWithIndex = one count job for partition sizes + the zip
    // pass; both read the one materialized range-shuffle output
    val zipped = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(zipped, schema)
  }
}
