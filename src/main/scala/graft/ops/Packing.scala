package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** ⊕ Sequence packing — the concat-and-chunk step every LLM
  * pretraining pipeline runs between "clean documents" and "training
  * batches" (GPT-3 / Gopher data prep; the reference's corpus feeds
  * the same consumers, `app.py:46-66` assembles display text the same
  * concat-first way): documents are laid end-to-end in a deterministic
  * total order into one global token stream, which is then cut into
  * fixed-`capacity` training sequences. A document starting at global
  * token offset `t` with `n` tokens occupies sequences
  * `t div C .. (t+n-1) div C` — crossing a boundary means the document
  * is split across training sequences (the packing-loss metric
  * curriculum/attention-masking decisions hang off).
  *
  * The primitive underneath is an exclusive PREFIX SUM of per-document
  * token counts in a global order — the same problem shape as
  * [[Ids.stableRowNumber]] (a prefix sum of 1s), and it reuses that
  * operator's two-pass construction, NOT a global window: `row_number()
  * / sum() over (ORDER BY ...)` with no partition is a SINGLE-TASK
  * plan, the one physical strategy that cannot exist at corpus scale.
  * Here:
  *
  *  1. `repartitionByRange` + `sortWithinPartitions` on the order key
  *     (Spark's sampling-based distributed sort — all partitions sort
  *     in parallel, partition i's keys precede partition j's for i<j);
  *  2. one lightweight job sums tokens per partition (#partitions
  *     longs of driver state — the centroid-collect bound) over the
  *     SAME materialized range-shuffle output;
  *  3. the zip pass adds `offset(partition) + local running sum`, and
  *     derives the sequence span with pure Long arithmetic (no
  *     double-division rounding at any corpus size).
  *
  * Zero-token rows are dropped (documented contract): a document with
  * no tokens has no position in the token stream — the F4
  * empty-after-clean stance; filter or repair upstream if they must
  * survive.
  *
  * Determinism: output is a pure function of the `orderCols` total
  * order (pass a unique tie-breaker — the repo-wide contract) and the
  * token counts; partition count only changes the physical split
  * (spec-proved invariant).
  */
object Packing {

  /** Appends `tok_start` (0-based exclusive prefix sum of `toksCol`),
    * `seq_first`, `seq_last`, `n_seqs` for a packing capacity of
    * `capacity` tokens per training sequence.
    *
    * @param orderCols total order (unique per row) — determinism contract
    * @param toksCol   name of the per-row token-count column (integral;
    *                  rows ≤ 0 are dropped — see object doc)
    * @param capacity  tokens per packed training sequence (> 0)
    * @param numPartitions range-partition count; defaults to the
    *        session's shuffle partitions (set
    *        [[graft.ops.Skew.partitionsForCorpus]] at real scale)
    * @param startOffset global token offset to resume from — the
    *   INCREMENTAL form: yesterday's corpus packed to a stream end of
    *   `E` tokens, today's increment packs with `startOffset = E` and
    *   the combined layout is identical to a from-scratch repack of
    *   the concatenated corpus (append-only order — spec-proved), so
    *   a daily 100 TB increment never re-reads the historical stream.
    */
  def packSequences(df: DataFrame, orderCols: Seq[Column], toksCol: String,
                    capacity: Long,
                    numPartitions: Option[Int] = None,
                    startOffset: Long = 0L): DataFrame = {
    require(orderCols.nonEmpty, "packSequences needs at least one order column")
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(startOffset >= 0, s"startOffset must be non-negative, got $startOffset")
    val filtered = df.filter(col(toksCol).cast("long") > 0)
    // the shared two-pass prefix sum (Ids.prefixSum — one range
    // exchange, #partitions longs of driver state); the sequence span
    // derives row-locally with integral `div` — exact at any corpus
    // size, no double-division rounding
    Ids.prefixSum(filtered, orderCols, toksCol, "tok_start",
        numPartitions, startOffset)
      .withColumn("seq_first", expr(s"tok_start div ${capacity}L"))
      .withColumn("seq_last",
        expr(s"(tok_start + CAST($toksCol AS BIGINT) - 1) div ${capacity}L"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1L)
  }

  /** ⊕ Deterministic corpus shuffle + fixed-size shard assignment —
    * the step between packing and writing training shards: examples
    * must reach the trainer in a "random" order that is nonetheless
    * REPRODUCIBLE (re-running data prep cannot silently reorder the
    * training run), and each output shard must hold exactly
    * `shardSize` examples so trainer workers stripe evenly. The
    * shuffle key is `md5(id)` (the q81 hash-assignment
    * reproducibility contract — no RNG state, no seed file; re-runs
    * and both engines derive the identical permutation), totally
    * ordered by the id tie-break; numbering rides
    * [[Ids.stableRowNumber]]'s two-pass range-sort construction, so
    * there is no single-task stage at any corpus size.
    *
    * Appends `shuffle_rank` (1-based position in the shuffled order)
    * and `shard_id` (= `(rank−1) div shardSize` — every shard full at
    * `shardSize` rows except the last). Write with
    * `.write.partitionBy("shard_id")` or one file per shard via the
    * [[graft.sinks]] layout helpers.
    */
  def shuffleShards(df: DataFrame, id: Column, shardSize: Long,
                    numPartitions: Option[Int] = None): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val keyed = df.withColumn("__shuffle_key", md5(id.cast("string")))
    Ids.stableRowNumber(keyed, Seq(col("__shuffle_key"), id),
        outCol = "shuffle_rank", numPartitions = numPartitions)
      .drop("__shuffle_key")
      // integral `div` — exact at any rank, no double-division rounding
      .withColumn("shard_id", expr(s"(shuffle_rank - 1) div ${shardSize}L"))
  }

  /** Fragmentation histogram over a [[packSequences]] result: for each
    * span width (`n_seqs` — how many training sequences a document
    * touches), the document count and token mass. In concat-and-chunk
    * packing every sequence except the global last is 100% full by
    * construction, so the quality metric is NOT fill — it is how many
    * documents get SPLIT across sequence boundaries (a split document
    * trains with a truncated context on each side). One hash
    * aggregation on a row-local key; output bounded by the widest span
    * (≈ longest_doc/capacity + 1 rows).
    */
  def fragmentation(packed: DataFrame, toksCol: String): DataFrame =
    packed
      .groupBy(col("n_seqs"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(toksCol).cast("long")).as("n_tokens"))
      .orderBy(col("n_seqs"))
}
