package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Z-ordered parquet layout: rank-normalize two cluster columns to
  * 16-bit buckets, Morton-interleave, then range-partition + sort by
  * the key and write — so every output file covers a small square of
  * the 2-D value space and parquet min/max stats prune files for
  * predicates on EITHER column (a single-column sort only prunes its
  * own column; LayoutSpec measures both layouts on real files).
  *
  * Rank bucketing uses `approx_percentile` cut points, not
  * min/max-width buckets — equal-width collapses under value skew
  * (one hot bucket ⇒ one hot file range ⇒ no pruning), while
  * quantile cuts keep bucket populations even by construction. The
  * cuts are ONE tiny aggregation (a 255-element array) broadcast
  * back; the bucket id is a 255-comparison fold inside the row-local
  * projection — the corpus shuffles exactly once, for the final
  * range partition, which a write needs anyway.
  */
object Layout {

  /** Bucket id = number of cut points ≤ value: a fold over the
    * broadcast cut array (0..cuts.size, monotone in the value).
    */
  private def bucketOf(v: Column, cuts: Column): Column =
    aggregate(cuts, lit(0),
      (acc, c) => acc + when(v >= c, lit(1)).otherwise(lit(0)))

  /** Write `df` z-ordered by `(a, b)` into `numFiles` parquet files
    * under `outDir`; returns the written path. 256 rank buckets per
    * dimension (16 bits of Morton key) — plenty to split any
    * realistic file count while keeping the cut arrays tiny.
    */
  def zorderWrite(df: DataFrame, a: Column, b: Column, outDir: String,
                  numFiles: Int = 16, buckets: Int = 256): DataFrame = {
    require(numFiles > 0 && buckets > 1 && buckets <= 65536,
      s"bad layout params: $numFiles files, $buckets buckets")
    val fracs = array((1 until buckets).map(i =>
      lit(i.toDouble / buckets)): _*)
    val cuts = df.agg(
      approx_percentile(a, fracs, lit(10000)).as("__ca"),
      approx_percentile(b, fracs, lit(10000)).as("__cb"))
    val keyed = df.crossJoin(broadcast(cuts))
      .withColumn("__zkey",
        ZOrder.zorder2(bucketOf(a, col("__ca")), bucketOf(b, col("__cb"))))
      .drop("__ca", "__cb")
    keyed
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(outDir)
    df.sparkSession.read.parquet(outDir)
  }

  /** Single-column sorted layout (the comparison baseline): range
    * partition + sort on one column only.
    */
  def sortedWrite(df: DataFrame, a: Column, outDir: String,
                  numFiles: Int = 16): DataFrame = {
    df.repartitionByRange(numFiles, a).sortWithinPartitions(a)
      .write.mode("overwrite").parquet(outDir)
    df.sparkSession.read.parquet(outDir)
  }
}
