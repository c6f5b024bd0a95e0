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
    import org.apache.spark.sql.functions.{col, lit}
    // collision-safe temp weight name (the stripPrefixes __tp_*
    // stance): withColumn on a fixed name would silently overwrite a
    // caller column of the same name before dropping it
    val one = Iterator.from(0).map(i => s"__srn_one$i")
      .find(n => !df.columns.contains(n)).get
    // row_number = exclusive prefix COUNT + 1 — the weight-1 instance
    // of the shared two-pass prefix sum
    prefixSum(df.withColumn(one, lit(1L)), orderCols, one, outCol,
        numPartitions)
      .withColumn(outCol, col(outCol) + 1L)
      .drop(one)
  }

  /** ⊕ The shared two-pass distributed EXCLUSIVE prefix sum over a
    * weight column — the single implementation behind
    * [[stableRowNumber]] (weight 1) and
    * [[graft.ops.Packing.packSequences]] (token counts):
    * `repartitionByRange` + `sortWithinPartitions` on the order key,
    * one per-partition weight-sum job (#partitions longs of driver
    * state) over the SAME materialized range-shuffle output, then the
    * zip pass adds `start + offset(partition) + local running sum`.
    * Appends `outCol` = the sum of all weights STRICTLY BEFORE the
    * row in `orderCols` order.
    */
  def prefixSum(df: DataFrame, orderCols: Seq[Column], weightCol: String,
                outCol: String, numPartitions: Option[Int] = None,
                start: Long = 0L): DataFrame = {
    require(orderCols.nonEmpty, "prefixSum needs at least one order column")
    require(!df.columns.contains(outCol),
      s"prefixSum: input already has a column named '$outCol' - appending " +
        "would create an ambiguous duplicate; pick a different outCol")
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val wIdx = sorted.schema.fieldIndex(weightCol)
    def w(r: Row): Long = r.get(wIdx) match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case o => throw new IllegalArgumentException(
        s"prefixSum: weight column '$weightCol' must be integral, got $o")
    }
    // one RDD over the materialized range shuffle; both jobs below
    // read the same shuffle files, so the exchange (and its boundary
    // sample) runs exactly once
    val rdd = sorted.rdd
    val partSums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += w(r))
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(start)(_ + _)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val zipped = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ acc)
        acc += w(r)
        out
      }
    }
    spark.createDataFrame(zipped, schema)
  }
}
