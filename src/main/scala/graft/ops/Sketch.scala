package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch, Spark-first: the d×w counter matrix IS a
  * DataFrame of at most d·w `(h, bucket, n)` rows, built by ONE
  * hash aggregation — which makes it mergeable for free (partial
  * aggregation collapses every partition to ≤ d·w rows map-side
  * before the shuffle, exactly the counter-wise sum a hand-rolled
  * sketch merge would do, except Tungsten codegens it).
  *
  * Complements the A6 sketch family (HLL q34 distinct counts, GK q49
  * quantiles, Misra-Gries q77 heavy hitters) with point-frequency
  * estimates: state bounded at d·w counters however many distinct
  * keys stream through, estimates never undercount, and overcounts
  * are bounded by colliding traffic (CountMinSpec proves both
  * directions adversarially at w=2).
  *
  * Reference `app.py` counts exact frequencies by re-scanning per
  * question; at 100 TB the sketch is built once at write time and
  * every later frequency probe is a broadcast join against ≤ d·w
  * rows — no second corpus scan.
  */
object Sketch {

  /** ⊕ Build the sketch: for each row and each hash index
    * `i < depth`, one update at `(i, xxhash64(i, key) mod width)`.
    * The explode multiplies rows by `depth` BEFORE the aggregation,
    * but partial aggregation collapses each partition to ≤ d·w
    * groups before anything shuffles, so the exchange carries
    * counters, not events. Null keys are excluded (no stable
    * identity — the [[Sampling.weightedSample]] convention).
    */
  def countMin(df: DataFrame, keyCol: Column,
               depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth x $width")
    df.filter(keyCol.isNotNull)
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("h"),
          pmod(xxhash64(lit(i), keyCol), lit(width.toLong)).as("bucket"))): _*))
        .as("rb"))
      .groupBy(col("rb.h").as("h"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** ⊕ Merge sketches built with the SAME depth/width: counter-wise
    * sum, which is exactly what building over the concatenated inputs
    * would produce — so per-day (or per-source, per-shard) sketches
    * roll up to the corpus sketch with no corpus re-scan, the
    * property that lets a 100 TB pipeline maintain the sketch
    * incrementally at ingest. CountMinSpec proves merge-of-parts ≡
    * build-over-whole exactly (integer counters, no tolerance).
    */
  def merge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("h"), col("bucket"))
      .agg(sum(col("n")).as("n"))
  }

  /** ⊕ Point-frequency estimates for `keys` against a [[countMin]]
    * sketch built with the SAME depth/width: the classic
    * min-over-rows readout. A `(h, bucket)` cell the sketch never
    * touched reads 0 (left join + coalesce), so unseen keys estimate
    * 0 — not null. The sketch side is ≤ d·w rows and broadcast; the
    * probe side explodes each key into its `depth` cells and takes
    * the min back per key — keys never shuffle the sketch.
    */
  def cmEstimate(sketch: DataFrame, keys: DataFrame, keyCol: Column,
                 depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth x $width")
    val cells = sketch.select(col("h").as("__sh"), col("bucket").as("__sb"),
      col("n").as("__sn"))
    keys.select(keyCol.as("key")).filter(col("key").isNotNull).distinct()
      .select(col("key"), explode(array((0 until depth).map(i =>
        struct(lit(i).as("h"),
          pmod(xxhash64(lit(i), col("key")), lit(width.toLong)).as("bucket"))): _*))
        .as("rb"))
      .join(broadcast(cells),
        col("rb.h") === col("__sh") && col("rb.bucket") === col("__sb"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("__sn"), lit(0L))).as("est_n"))
  }
}
