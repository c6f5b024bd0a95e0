package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ Distribution drift between two corpus snapshots — the monitoring
  * op a pipeline runs between "yesterday's corpus" and "today's"
  * before a training job consumes the delta (the reference's flow
  * refreshes its corpus per run, `app.py:46-52`, with no drift gate —
  * this is the screen that catches a collapsed source, a format
  * change, or a scraper gone wrong BEFORE it trains in).
  *
  * Metric: Population Stability Index, PSI = Σ_c (p_c − q_c)·ln(p_c/q_c)
  * over categories (the standard model-monitoring measure; ≥ 0, with
  * the usual reading: < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).
  * Zero-count cells make the raw PSI undefined, so both sides use
  * Laplace-smoothed rates p = (c + 1)/(n + K) over the UNION category
  * set K — the q154 Naive-Bayes convention.
  *
  * Engine-exact arithmetic (the q137/q154 integer-units discipline):
  * counts are exact integers; each smoothed rate is ONE
  * correctly-rounded double division quantized to integer MICRO-units
  * (`floor(p·1e6 + 0.5)`), each log-rate to integer NANO-units
  * (`floor(ln(p)·1e9 + 0.5)` — [[graft.ext.Classify]]'s `units`); a
  * category's PSI contribution is then the exact integer product
  * `(p_u − q_u)·(ln p_u − ln q_u)` in 1e-15 units, and the corpus
  * total an exact order-free decimal(38,0) sum — bit-identical across
  * engines and partitionings.
  *
  * Plan shape at scale: one hash aggregation per snapshot on the
  * category key, a category-cardinality full-outer join, and a
  * single-row broadcast normalizer (totals + K — the q79/q93 stance).
  * The snapshots themselves are never joined row-to-row; cost is two
  * scans + category-sized everything-else.
  */
object Drift {

  private def lnUnits(x: Column): Column = floor(log(x) * 1e9 + 0.5).cast("long")
  private def rateUnits(x: Column): Column = floor(x * 1e6 + 0.5).cast("long")

  /** Per-category drift table between snapshots `a` and `b`:
    * `(category, count_a, count_b, rate_a_units, rate_b_units,
    * psi_units)` — rates in 1e-6 units, PSI contributions in 1e-15
    * units (divide by 1e15 for the conventional reading). Categories
    * absent from one side appear with count 0 (smoothing keeps the
    * logs finite). Null categories are counted as a real category by
    * the full-outer join semantics of their side only if present —
    * pass `coalesce(cat, lit("__null"))` to pool them explicitly.
    */
  def categoricalDrift(a: DataFrame, b: DataFrame, cat: Column): DataFrame =
    driftFromCounts(
      a.select(cat.as("category")).groupBy(col("category"))
        .agg(count(lit(1)).as("count_a")),
      b.select(cat.as("category")).groupBy(col("category"))
        .agg(count(lit(1)).as("count_b")))

  /** The PSI core over PRE-AGGREGATED counts — `(category, count_a)`
    * vs `(category, count_b)`. This is the streaming-composable form:
    * maintain the B side as a streaming `groupBy(category).count()`
    * (counts are the mergeable sufficient statistic — the count-min
    * / A6 stance) and read PSI against a static baseline per trigger;
    * StreamingSpec proves stream-maintained counts ≡ the batch drift
    * of the same rows.
    */
  def driftFromCounts(countsA: DataFrame, countsB: DataFrame): DataFrame = {
    val joined = countsA.join(countsB, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("count_a"), lit(0L)).as("count_a"),
        coalesce(col("count_b"), lit(0L)).as("count_b"))
    val norm = joined.agg(
      sum(col("count_a")).as("__na"),
      sum(col("count_b")).as("__nb"),
      count(lit(1)).as("__k"))
    val pa = (col("count_a") + 1).cast("double") / (col("__na") + col("__k"))
    val pb = (col("count_b") + 1).cast("double") / (col("__nb") + col("__k"))
    joined.crossJoin(broadcast(norm))
      .select(col("category"), col("count_a"), col("count_b"),
        rateUnits(pa).as("rate_a_units"),
        rateUnits(pb).as("rate_b_units"),
        ((rateUnits(pa) - rateUnits(pb)) * (lnUnits(pa) - lnUnits(pb)))
          .as("psi_units"))
  }

  /** Total PSI over a [[categoricalDrift]] table, as one
    * decimal(38,0) row in 1e-15 units — exact at any category count.
    */
  def totalPsi(drift: DataFrame): DataFrame =
    drift.agg(coalesce(sum(col("psi_units").cast("decimal(38,0)")),
      lit(0).cast("decimal(38,0)")).as("psi_total_units"))

  /** ⊕ The CI-gate form ([[graft.ops.Check.requireValid]]'s stance
    * applied to drift): compute the drift table, FAIL LOUDLY when
    * total PSI exceeds `maxPsi` (conventional reading: 0.1 stable,
    * 0.25 shifted), naming the worst categories — the job a pipeline
    * runs between "new snapshot landed" and "training consumes it".
    * Returns the drift table when the gate passes.
    *
    * @param maxPsi threshold in NATS (converted internally to the
    *        exact 1e-15-unit scale [[totalPsi]] reports)
    */
  def requireStable(a: DataFrame, b: DataFrame, cat: Column,
                    maxPsi: Double = 0.25): DataFrame = {
    require(maxPsi > 0, s"maxPsi must be positive, got $maxPsi")
    val d = categoricalDrift(a, b, cat).localCheckpoint()
    val total = totalPsi(d).head().getDecimal(0)
    val limit = java.math.BigDecimal.valueOf(maxPsi)
      .multiply(java.math.BigDecimal.valueOf(1e15)).toBigInteger
    if (total.toBigInteger.compareTo(limit) > 0) {
      val worst = d.orderBy(col("psi_units").desc).limit(3).collect()
        .map(r => s"  ${r.get(0)}: count ${r.getLong(1)} -> ${r.getLong(2)}, " +
          s"psi_units ${r.getLong(5)}")
        .mkString("\n")
      throw new IllegalStateException(
        s"distribution drift gate failed: total PSI ${total.toBigInteger} " +
          s"exceeds ${limit} (${maxPsi} nats); worst categories:\n$worst")
    }
    d
  }

  /** ⊕ Numeric drift: [[categoricalDrift]] over quantile bins —
    * bin edges are snapshot A's exact interpolated `(1..n−1)/n`
    * percentiles (Spark `percentile` ≡ DuckDB `quantile_cont` to the
    * bit — the q124/q140 evidence), so every bin holds ≈ 1/n of the
    * BASELINE mass and the PSI reads directly as "how far has B moved
    * off A's shape". Equal-width bins are the naive alternative and
    * collapse under skew (one bin takes everything — the q138
    * rank-bucketing rationale).
    *
    * The edge vector is the only driver state (n−1 doubles — the
    * centroid-collect bound); bin assignment is a row-local
    * codegen'd comparison sum, `bin = Σ_e [x ≥ e]` (ties go UP — an
    * interpolated edge that lands exactly on a data value is common,
    * and both engines hold the same edge bits so the tie rule
    * agrees). Nulls are bin −1, a REAL category: a null-rate shift is
    * drift and must show in the report, not vanish.
    */
  def numericDrift(a: DataFrame, b: DataFrame, x: Column, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"numericDrift needs >= 2 bins, got $nBins")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val edgeRow = a.select(x.as("__x"))
      .agg(percentile(col("__x"), typedLit(probs)).as("es")).first()
    require(!edgeRow.isNullAt(0),
      "numericDrift: snapshot A has no non-null values to derive bin edges from")
    val edges = edgeRow.getSeq[Double](0)
    def binOf(c: Column): Column = when(c.isNull, lit(-1L)).otherwise(
      edges.map(e => when(c >= lit(e), 1L).otherwise(0L)).reduce(_ + _))
    categoricalDrift(a.select(binOf(x).as("bin")), b.select(binOf(x).as("bin")),
      col("bin"))
  }
}
