package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ⊕ Interval × interval overlap join — the two-sided generalization
  * of [[AsOf.rangePairsBackward]] (which bands a POINT against a
  * window). Sessions × campaigns, ad flights × content windows,
  * span-annotation reconciliation: "all pairs whose validity ranges
  * intersect" is an inequality-only join that Spark would otherwise
  * execute as a per-key cross product (BroadcastNestedLoopJoin at
  * corpus scale — the plan that cannot exist at 100 TB).
  *
  * Chunk decomposition: time is cut into `chunkSec`-wide chunks; each
  * interval registers in every chunk it covers (`sequence` + explode,
  * explode factor = len/chunkSec + 1), the join is a plain (key,
  * chunk) equi-join, and the true overlap predicate filters in-chunk.
  * A pair whose intervals overlap shares every chunk the overlap
  * region covers; emitting only in the FIRST such chunk — the chunk
  * containing `greatest(a.start, b.start)`, which both sides cover by
  * definition of overlap — makes each pair appear exactly once with
  * no `distinct` (no second shuffle over the pair fan-out).
  *
  * Tuning: `chunkSec` ≈ the typical interval length keeps the explode
  * factor ~2 while keeping chunks selective. Degenerate intervals
  * (end < start, null bounds/keys) are dropped — an empty range
  * overlaps nothing. A single pathological interval spanning more
  * than `maxChunksPerInterval` chunks fails LOUDLY (the q131
  * maxBucket stance: degeneracy is an error to surface, not a row
  * explosion to absorb).
  */
object Interval {

  /** All (left, right) pairs with equal `key` whose CLOSED intervals
    * `[start, end]` (timestamp columns) intersect. Returns struct
    * columns `l` and `r` (inner semantics).
    *
    * Resolution: bounds are compared at WHOLE-SECOND granularity
    * (`unix_seconds` truncation — the repo-wide integral-epoch
    * convention shared with the Time/AsOf family and their oracles),
    * so two intervals whose raw bounds differ only inside the same
    * second count as touching. Callers needing sub-second semantics
    * should pre-scale their timestamps.
    */
  def overlapPairs(left: DataFrame, right: DataFrame, key: String,
                   leftStart: String, leftEnd: String,
                   rightStart: String, rightEnd: String,
                   chunkSec: Long,
                   maxChunksPerInterval: Int = 1024): DataFrame = {
    require(chunkSec > 0, "chunkSec must be positive")
    require(maxChunksPerInterval > 0, "maxChunksPerInterval must be positive")

    def side(df: DataFrame, start: String, end: String, out: String): DataFrame = {
      // NTZ-tolerant (the readNormalized stance): a raw parquet read
      // yields TIMESTAMP_NTZ, which unix_seconds rejects; the cast is
      // a no-op for TimestampType and session-TZ-stable (UTC) for NTZ.
      val s = unix_seconds(col(start).cast("timestamp"))
      val e = unix_seconds(col(end).cast("timestamp"))
      df.filter(col(key).isNotNull && col(start).isNotNull &&
          col(end).isNotNull && col(end) >= col(start))
        .select(
          struct(df.columns.map(col): _*).as(out),
          col(key).as("__k"),
          s.as(s"__${out}s"), e.as(s"__${out}e"),
          floor(s / chunkSec).as("__cs"), floor(e / chunkSec).as("__ce"))
        // Loud degenerate-interval guard: kept in a Filter so pruning
        // can't drop it (the Diff.requireUniqueKey idiom).
        .filter(assert_true(col("__ce") - col("__cs") < maxChunksPerInterval,
          concat(lit(s"Interval.overlapPairs: interval spans "),
            (col("__ce") - col("__cs") + 1).cast("string"),
            lit(s" chunks of ${chunkSec}s (max $maxChunksPerInterval); " +
              "raise chunkSec or maxChunksPerInterval"))).isNull)
        .withColumn("__c", explode(sequence(col("__cs"), col("__ce"))))
        .drop("__cs", "__ce")
    }

    val ls = side(left, leftStart, leftEnd, "l")
    val rs = side(right, rightStart, rightEnd, "r")
    ls.join(rs, Seq("__k", "__c"))
      .filter(col("__ls") <= col("__re") && col("__rs") <= col("__le") &&
        // first-overlapping-chunk dedup: exactly one chunk holds the
        // overlap start, and both intervals cover it
        col("__c") === floor(greatest(col("__ls"), col("__rs")) / chunkSec))
      .select(col("l"), col("r"))
  }
}
