package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins (north-star 100 TB design):
  * when one join key carries a disproportionate share of rows (a viral
  * post's comments, a bot account's events), a plain hash join puts the
  * whole key on one task. AQE's skew-join split handles many cases at
  * runtime; explicit salting is the deterministic fallback when the
  * skewed side can't be split (e.g. followed by a per-key window) or
  * AQE is unavailable.
  *
  * Salting: the skewed (probe) side gets a uniform salt in [0, n);
  * the build side is replicated n× (one copy per salt value); the join
  * key becomes (key, salt), spreading each hot key over n tasks. Cost:
  * build side shuffles n× its size — use only when build ≪ probe and
  * broadcast is too big.
  */
object Skew {

  /** Shuffle-partition count that holds post-shuffle partition size
    * ≈ `rowsPerPartition` rows at `rows` total — the
    * `spark.sql.shuffle.partitions` analogue of
    * [[graft.ext.Similarity.bitsForCorpus]]: a FIXED partition count
    * is the same scaling bug as a fixed bucket width (per-partition
    * bytes grow linearly with the corpus until sort/aggregate state
    * spills — the measured q107/q119 sf10 caveat), while a sized
    * count keeps per-task memory constant. Floored at `minParts` (32,
    * the fixture-scale session default, so derived == pinned at every
    * driver sf — the bitsForCorpus floor convention); capped at
    * `maxParts` (Spark schedules fine to ~100k tasks/stage, beyond
    * which driver bookkeeping dominates).
    *
    * The default 256k rows/partition targets ~128 MB tasks at the
    * ~0.5 KB row width typical of this engine's exploded
    * intermediates (bucketed LSH rows, token streams); pass the real
    * post-explosion row count (e.g. n·numTables for LSH bucketing,
    * n·tokens for text pipelines), not the input row count.
    *
    * Use it two ways: the Auto operator forms size their dominant
    * exchange with it directly; for whole-pipeline runs set
    * `spark.sql.shuffle.partitions` from it at session init (what
    * ScaleBench's decade runs do). On a real cluster AQE then
    * coalesces small partitions back down — oversizing is cheap,
    * undersizing spills.
    */
  def partitionsForCorpus(rows: Long, rowsPerPartition: Long = 1L << 18,
                          minParts: Int = 32, maxParts: Int = 100000): Int = {
    require(rowsPerPartition > 0, s"rowsPerPartition must be positive, got $rowsPerPartition")
    math.min(maxParts.toLong,
      math.max(minParts.toLong,
        (rows + rowsPerPartition - 1) / rowsPerPartition)).toInt
  }

  /** Inner equi-join `big ⋈ small` on `key`, salted `n` ways. Result
    * equals `big.join(small, key)` row-for-row; only the physical
    * distribution changes. The salt must be DETERMINISTIC per row
    * (`rand()` feeding a shuffle key is the SPARK-23207 hazard: a
    * partial stage retry re-rolls salts and duplicates/loses rows), so
    * it is `pmod(xxhash64(all columns), n)` — any per-row assignment
    * preserves correctness since each big-side row meets every
    * small-side replica exactly once via its own salt value.
    * (Fully-identical duplicate rows share a salt; acceptable — skew
    * from exact duplicates is bounded by the duplicate count.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 n: Int = 16): DataFrame = {
    require(n > 0)
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(n.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** ⊕ Auto-selecting join: probe the probe-side key histogram
    * ([[maxKeyShare]], optionally on a deterministic sample) and pick
    * [[saltedJoin]] when the hottest key owns more than `threshold`
    * of the rows, the plain hash join otherwise — the join-side
    * completion of the [[graft.ops.Time]] auto wrappers (q96/q98):
    * a 100 TB pipeline can't require a human to read a histogram
    * before every join. Default threshold mirrors the measured ~1/32
    * window-family switch-over; both arms are row-for-row equal
    * (saltedJoin's contract), so the choice affects only the
    * physical distribution.
    */
  def autoJoin(big: DataFrame, small: DataFrame, key: String,
               n: Int = 16,
               threshold: Double = Time.HotKeyShareThreshold,
               sampleFraction: Double = 1.0): DataFrame =
    if (Time.isHotKeyed(big, col(key), threshold, sampleFraction))
      saltedJoin(big, small, key, n)
    else big.join(small, Seq(key))

  /** Top-k keys by frequency — the diagnostic used to decide whether a
    * join needs salting (and which keys AQE will split).
    */
  def keyHistogram(df: DataFrame, key: Column, k: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n_rows"))
      .orderBy(desc("n_rows"))
      .limit(k)

  /** Share of rows owned by the single most frequent key (a null key
    * counts as a key — it hot-spots a window partition like any
    * other). The scalar feeding [[graft.ops.Time]]'s auto-selecting
    * skew wrappers. `fraction < 1` probes a deterministic sample
    * (fixed seed — same input, same decision); the probe itself is
    * skew-immune because `count(*)` partial-aggregates map-side, so a
    * hot key costs one long per input partition, and the two-level
    * aggregate never collects rows to the driver (the result is a
    * single scalar row).
    */
  def maxKeyShare(df: DataFrame, key: Column, fraction: Double = 1.0,
                  seed: Long = 42L): Double = {
    require(fraction > 0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    val s = if (fraction < 1.0) df.sample(withReplacement = false, fraction, seed)
            else df
    val r = s.groupBy(key).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__max"), sum(col("__n")).as("__tot"))
      .head()
    if (r.isNullAt(1) || r.getLong(1) == 0L) 0.0
    else r.getLong(0).toDouble / r.getLong(1).toDouble
  }
}
