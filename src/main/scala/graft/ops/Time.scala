package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X13 — the reference's `time_filter ∈ {all, day, week, month, year}`
  * enum (`app.py:256,47,83`) as an engine-side predicate builder. The
  * reference delegates the window to the API server-side; we define
  * the deltas explicitly (month = 30 days, year = 365 days — fixed
  * spans, not calendar arithmetic, so the predicate stays a constant
  * range comparison the scan can push down).
  */
object Time {

  private val spans: Map[String, String] = Map(
    "day"   -> "INTERVAL 1 DAY",
    "week"  -> "INTERVAL 7 DAYS",
    "month" -> "INTERVAL 30 DAYS",
    "year"  -> "INTERVAL 365 DAYS")

  /** Predicate `ts >= now - span(filter)`; `"all"` → always true.
    * `now` is an explicit column (pass a literal timestamp) so plans
    * stay deterministic and cache-stable — never `current_timestamp`
    * buried in the operator.
    */
  def timeFilter(ts: Column, filter: String, now: Column): Column =
    filter match {
      case "all" => lit(true)
      case f =>
        val span = spans.getOrElse(f,
          throw new IllegalArgumentException(
            s"unknown time_filter '$f' (expected ${("all" +: spans.keys.toSeq.sorted).mkString("/")})"))
        ts >= (now - expr(span))
    }

  /** ⊕ Resample to a fixed time grid with forward fill: per key,
    * bucket observations into `stepSec`-second bins (last observation
    * per bin — `max(struct(epoch, value))`, the deterministic
    * lexicographic tiebreak), generate the full bin range between the
    * key's first and last observation, and carry the last seen value
    * across empty bins (`last(…, ignoreNulls)` over the bin order) —
    * the gap-fill every time-series feature pipeline runs before
    * windowed aggregation. `was_observed` marks real vs carried rows.
    *
    * Scale shape: one aggregation (map-side combinable) + one
    * explode of per-key bin RANGES (rows = span/step per key, never
    * corpus×grid) + one window over the bin order. A key's grid span
    * is bounded by its own observation span; the explode never
    * manufactures rows outside it. Value is an observed value, not a
    * sum — no floating-point accumulation to round.
    */
  def resampleFill(df: org.apache.spark.sql.DataFrame, key: Column,
                   ts: Column, value: Column, stepSec: Long)
      : org.apache.spark.sql.DataFrame = {
    require(stepSec > 0, s"stepSec must be positive, got $stepSec")
    val bin = floor(unix_seconds(ts) / stepSec).cast("long")
    val bucketed = df
      .select(key.as("key"), bin.as("bin"),
        struct(unix_seconds(ts).as("e"), value.as("v")).as("obs"))
      .groupBy(col("key"), col("bin")).agg(max(col("obs")).as("obs"))
    val grid = df.groupBy(key.as("key"))
      .agg(min(bin).as("__lo"), max(bin).as("__hi"))
      .select(col("key"), explode(sequence(col("__lo"), col("__hi"))).as("bin"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("bin"))
    grid.join(bucketed, Seq("key", "bin"), "left")
      .select(col("key"), col("bin"),
        last(col("obs.v"), ignoreNulls = true).over(w).as("value"),
        col("obs").isNotNull.as("was_observed"))
  }

  /** ⊕ Trailing time-window frame for rolling per-key features
    * (rolling counts/sums over "the last `spanSec` seconds" — the
    * standard session/feature-engineering aggregate): a RANGE frame
    * over integral epoch seconds, `[ts - spanSec, ts]` inclusive.
    *
    * Takes the ORDER column as epoch seconds (e.g.
    * `unix_seconds(col("ts"))`) rather than a timestamp: integral
    * range frames are engine-portable (no interval arithmetic inside
    * the frame spec) and make the peer-row semantics exact. One
    * shuffle on the partition key; within a partition the frame is
    * evaluated by a single ordered scan.
    *
    * Hot-key warning (measured, `tools/SkewBench` / BASELINE.md §skew):
    * this is the window family's breaking point — a key owning 25% of
    * 12M rows is 32× slower than uniform (the range-frame peer scan is
    * superlinear in in-window density). Mitigate by pre-aggregating to
    * per-(key, epochSecond) partials first (map-side combine splits
    * the hot key; frame density caps at distinct timestamps per span),
    * or for sum-like aggregates rephrase as a difference of two
    * running sums and chunk them like [[withDecayedScoreChunked]].
    */
  def trailingWindow(partition: Column, epochSeconds: Column,
                     spanSec: Long): org.apache.spark.sql.expressions.WindowSpec = {
    require(spanSec >= 0, s"spanSec must be non-negative, got $spanSec")
    org.apache.spark.sql.expressions.Window
      .partitionBy(partition)
      .orderBy(epochSeconds.asc)
      .rangeBetween(-spanSec, org.apache.spark.sql.expressions.Window.currentRow)
  }

  /** ⊕ Exponential time-decay score per key: at each event,
    * `score = Σ_{i ≤ now} value_i · exp(−λ·(t_now − t_i))` — the
    * standard recency-weighted engagement/feature signal.
    *
    * The naive form recomputes the whole weighted sum per row (O(n²)
    * per key, and SQL window aggregates can't reference the current
    * row's timestamp inside the frame anyway). The algebraic
    * reformulation `exp(−λ·t_now) · Σ value_i · exp(λ·t_i)` turns it
    * into ONE running window sum over `u_i = value_i·exp(λ·t_i)` —
    * one shuffle on the key, one ordered pass per partition, O(n).
    *
    * `tRef` rebases timestamps (days since a fixed epoch) so
    * `exp(λ·t)` stays in range — with raw epoch seconds the inner
    * terms overflow double. λ is per `tUnit` of the rebased axis.
    */
  def decayedScore(partition: Column, t: Column, tie: Column, value: Column,
                   lambda: Double): Column = {
    require(lambda > 0, s"lambda must be positive, got $lambda")
    // (t, tie) is a TOTAL order: with a ROWS frame, equal-t rows would
    // otherwise receive order-dependent prefix sums
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partition).orderBy(t.asc, tie.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    exp(t * -lambda) * sum(value * exp(t * lambda)).over(w)
  }

  /** ⊕ Hot-key-safe trailing count+sum: the mitigation for
    * [[trailingWindow]]'s measured breaking point (32× under a
    * 25%-share hot key, `tools/SkewBench` — Spark's sliding RANGE
    * frame RE-AGGREGATES the whole frame per distinct bound, so cost
    * is O(rows × in-frame peers) per partition, superlinear in
    * hot-key density).
    *
    * Pre-aggregate to per-(key, epochSecond) partials — map-side
    * combinable, so the hot key's reduce work spreads across input
    * partitions — then run the RANGE frame over the PER-SECOND rows
    * (≤ one per second per key: both the partition row count and the
    * in-frame peer count collapse to distinct-seconds, the quadratic
    * term's cap) and join the trailing values back on
    * (key, epochSecond). EXACT, not approximate: with integral epoch
    * seconds, same-second rows are RANGE-frame PEERS and already
    * share one trailing value in the plain form — q89 hash-checks
    * this equivalence by running THIS form against the plain form's
    * SQL. The bigger rows-per-second is (the 100 TB regime for
    * rolling features), the bigger the win; at ~1 row/sec it only
    * re-shapes the shuffle.
    *
    * Null keys/timestamps are handled null-safely (`<=>` join-back):
    * a null key is one group and null epoch seconds are mutual RANGE
    * peers, exactly as the plain window form groups them — no rows
    * are dropped (TimeNullSpec proves row-for-row equivalence on a
    * null-bearing fixture).
    */
  def trailingSumsByTime(df: org.apache.spark.sql.DataFrame,
                         key: String, epochSecCol: String, valueCol: String,
                         spanSec: Long,
                         outN: String = "n_trailing",
                         outSum: String = "sum_trailing"): org.apache.spark.sql.DataFrame = {
    require(spanSec >= 0, s"spanSec must be non-negative, got $spanSec")
    import org.apache.spark.sql.expressions.Window
    val partials = df.groupBy(col(key), col(epochSecCol))
      .agg(count(lit(1)).as("__pn"), sum(col(valueCol)).as("__psum"))
    val w = Window.partitionBy(col(key)).orderBy(col(epochSecCol).asc)
      .rangeBetween(-spanSec, Window.currentRow)
    val trail = partials
      .withColumn(outN, sum(col("__pn")).over(w))
      .withColumn(outSum, sum(col("__psum")).over(w))
      .select(col(key).as("__tk"), col(epochSecCol).as("__tt"),
        col(outN), col(outSum))
    // Null-safe join-back: an inner equality join would silently drop
    // rows with a null key or null epoch second that the plain window
    // form keeps (window partitioning groups nulls). <=> is still an
    // equi-join condition (EqualNullSafe extracts join keys), so the
    // physical plan stays a hash/sort-merge join, and it infers no
    // isnotnull constraints into the branches.
    df.join(trail, col(key) <=> col("__tk") && col(epochSecCol) <=> col("__tt"))
      .drop("__tk", "__tt")
  }

  /** ⊕ Hot-key-safe form of [[decayedScore]]: the single-window form
    * puts ALL of a key's rows in one window partition, so one viral
    * user serializes one task (measured: a key owning 10% of 12M rows
    * makes the plain window ~linear in that key's size —
    * `tools/SkewBench`). This variant splits each key by TIME CHUNK
    * and reassembles the running sum in two passes:
    *
    *  1. within-chunk running sum, windowed over `(key, chunk)` — the
    *     hot key spreads across its chunks (shuffle key has chunk in
    *     it), each task bounded by rows-per-chunk, not rows-per-key;
    *  2. chunk TOTALS (one row per (key, chunk) — tiny) get a running
    *     offset over strictly-prior chunks, windowed per key; the
    *     offset joins back on `(key, chunk)` and adds to the
    *     within-chunk prefix. AQE can split the join if a single
    *     (key, chunk) is still hot — unlike a window partition, an
    *     equi-join IS skew-splittable.
    *
    * Same semantics as [[decayedScore]] up to floating-point
    * summation order (chunked reassociation; property-tested to
    * ~1e-9 relative). `chunkSpan` is in units of `tCol`: pick it so a
    * hot key's densest span lands ≥ `shuffle.partitions` chunks.
    * Null keys/timestamps pass through null-safely like the plain
    * form — no rows dropped (TimeNullSpec).
    */
  def withDecayedScoreChunked(df: org.apache.spark.sql.DataFrame,
                              key: String, tCol: String, tieCol: String,
                              valueCol: String, lambda: Double,
                              chunkSpan: Double,
                              out: String = "decay_score"): org.apache.spark.sql.DataFrame = {
    require(lambda > 0, s"lambda must be positive, got $lambda")
    require(chunkSpan > 0, s"chunkSpan must be positive, got $chunkSpan")
    import org.apache.spark.sql.expressions.Window
    val d = df
      .withColumn("__chunk", floor(col(tCol) / chunkSpan).cast("long"))
      .withColumn("__u", col(valueCol) * exp(col(tCol) * lambda))
    val w1 = Window.partitionBy(col(key), col("__chunk"))
      .orderBy(col(tCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = d.withColumn("__within", sum(col("__u")).over(w1))
    // Chunk total = the LAST within-chunk prefix value, picked by a
    // row_number over the reversed order — deterministic in both
    // engines (a groupBy SUM would re-fold __u in partitioning-
    // dependent order, breaking bit-equality with the SQL oracle) and
    // it rides w1's (key, chunk) exchange: same partition keys, one
    // extra in-partition sort, NO extra shuffle.
    val wLast = Window.partitionBy(col(key), col("__chunk"))
      .orderBy(col(tCol).desc, col(tieCol).desc)
    val wOff = Window.partitionBy(col(key)).orderBy(col("__chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = within
      .withColumn("__rn", row_number().over(wLast))
      .filter(col("__rn") === 1)
      .withColumn("__offset", coalesce(sum(col("__within")).over(wOff), lit(0.0)))
      .select(col(key), col("__chunk"), col("__offset"))
    // Null-safe join-back (<=>): rows with a null key or null t (null
    // chunk) pass through like the plain [[decayedScore]] form — a
    // null key is one window group; a null t yields a null score in
    // BOTH forms (exp(null·λ) poisons the row's own term while sum()
    // skips it for its peers). <=> infers no isnotnull constraints,
    // so the two join branches stay byte-identical subtrees and
    // exchange/stage reuse still dedupes them (previously this needed
    // an explicit null filter, which silently dropped those rows).
    val offs = offsets.withColumnRenamed(key, "__ok")
      .withColumnRenamed("__chunk", "__oc")
    within.join(offs, col(key) <=> col("__ok") && col("__chunk") <=> col("__oc"))
      .withColumn(out, exp(col(tCol) * -lambda) * (col("__offset") + col("__within")))
      .drop("__chunk", "__u", "__within", "__offset", "__ok", "__oc")
  }

  /** Plain single-window trailing count+sum over [[trailingWindow]] —
    * the uniform-key form [[trailingSumsAuto]] picks when no key is
    * hot. Kept as a named op so the auto wrapper's two arms are the
    * exact forms q89 hash-proved equivalent.
    */
  def trailingSums(df: org.apache.spark.sql.DataFrame,
                   key: String, epochSecCol: String, valueCol: String,
                   spanSec: Long,
                   outN: String = "n_trailing",
                   outSum: String = "sum_trailing"): org.apache.spark.sql.DataFrame = {
    val w = trailingWindow(col(key), col(epochSecCol), spanSec)
    df.withColumn(outN, sum(lit(1L)).over(w))
      .withColumn(outSum, sum(col(valueCol)).over(w))
  }

  /** Hot-key share above which the skew-safe window forms win.
    * Measured (`tools/SkewBench`, BASELINE.md §skew): the plain RANGE
    * frame was 32× slower at a 25% single-key share and the plain
    * running window ~5× at 10%; both stay flat below a few percent.
    * ~1/32 of a stage's rows is the documented switch-over — at 32
    * shuffle partitions that is exactly the share where one key
    * saturates one task.
    */
  val HotKeyShareThreshold: Double = 1.0 / 32

  /** The decision probe for the auto wrappers: does any single key own
    * ≥ `threshold` of the rows? One cheap aggregate pass (optionally
    * sampled — deterministic seed, so same input → same plan choice);
    * see [[Skew.maxKeyShare]] for why the probe itself is skew-immune.
    */
  def isHotKeyed(df: org.apache.spark.sql.DataFrame, key: Column,
                 threshold: Double = HotKeyShareThreshold,
                 sampleFraction: Double = 1.0): Boolean =
    Skew.maxKeyShare(df, key, sampleFraction) >= threshold

  /** ⊕ Auto-selecting trailing count+sum: probes the key histogram and
    * picks the plain window ([[trailingSums]]) under uniform keys or
    * the per-second pre-aggregated form ([[trailingSumsByTime]]) when
    * a key owns ≥ `threshold` of the rows — the forms are exact
    * equivalents (q89 hash-proof), so the choice is purely physical.
    * A 100 TB operator can't require a human to read a histogram
    * before every run; this makes the documented switch-over
    * executable. Cost: one extra aggregate pass over `df` (or a
    * sample) — cache `df` upstream if it is itself expensive.
    */
  def trailingSumsAuto(df: org.apache.spark.sql.DataFrame,
                       key: String, epochSecCol: String, valueCol: String,
                       spanSec: Long,
                       outN: String = "n_trailing",
                       outSum: String = "sum_trailing",
                       threshold: Double = HotKeyShareThreshold,
                       sampleFraction: Double = 1.0): org.apache.spark.sql.DataFrame =
    if (isHotKeyed(df, col(key), threshold, sampleFraction))
      trailingSumsByTime(df, key, epochSecCol, valueCol, spanSec, outN, outSum)
    else
      trailingSums(df, key, epochSecCol, valueCol, spanSec, outN, outSum)

  /** ⊕ Auto-selecting decayed score: plain single-window
    * [[decayedScore]] under uniform keys, time-chunked
    * [[withDecayedScoreChunked]] when a key owns ≥ `threshold` of the
    * rows (q88 hash-proved the forms equivalent). Same probe contract
    * as [[trailingSumsAuto]].
    */
  def decayedScoreAuto(df: org.apache.spark.sql.DataFrame,
                       key: String, tCol: String, tieCol: String,
                       valueCol: String, lambda: Double, chunkSpan: Double,
                       out: String = "decay_score",
                       threshold: Double = HotKeyShareThreshold,
                       sampleFraction: Double = 1.0): org.apache.spark.sql.DataFrame =
    if (isHotKeyed(df, col(key), threshold, sampleFraction))
      withDecayedScoreChunked(df, key, tCol, tieCol, valueCol, lambda, chunkSpan, out)
    else
      df.withColumn(out,
        decayedScore(col(key), col(tCol), col(tieCol), col(valueCol), lambda))

  /** The lower bound itself (for APIs that want a `sinceTs` value,
    * e.g. [[graft.pipelines.SignalScan.Params]]); None for `"all"`.
    */
  def sinceTs(filter: String, now: java.sql.Timestamp): Option[java.sql.Timestamp] =
    filter match {
      case "all" => None
      case f =>
        val days = f match {
          case "day" => 1L; case "week" => 7L; case "month" => 30L
          case "year" => 365L
          case other => throw new IllegalArgumentException(
            s"unknown time_filter '$other' (expected all/day/month/week/year)")
        }
        Some(new java.sql.Timestamp(now.getTime - days * 86400000L))
    }
}
