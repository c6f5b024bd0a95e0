package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ⊕ Sampling for training-data pipelines: stratified down-sampling
  * (class balancing) and deterministic hash-based sampling.
  *
  * Two forms with different contracts:
  *  - [[stratified]] wraps `DataFrame.stat.sampleBy` — Bernoulli per
  *    stratum, output is partitioning-dependent (NOT reproducible
  *    across layouts); right when only the RATE matters.
  *  - [[byHash]] keeps a row iff a stable hash of its key lands under
  *    the rate — fully deterministic given the key (the form a rerun
  *    of a 100 TB job must use: adding executors cannot change the
  *    sample), and consistent across tables sharing the key.
  */
object Sampling {

  /** Per-stratum Bernoulli sample: `fractions` maps stratum value →
    * keep rate. Strata absent from the map are dropped.
    */
  def stratified(df: DataFrame, stratumCol: String,
                 fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Deterministic keyed sample: the first 5 hex digits of
    * `md5(key || '|' || salt)` give a uniform bucket in [0, 16^5);
    * keep iff `bucket < rate·16^5`. Same key → same decision
    * everywhere, independent of partitioning, and re-computable in
    * ANSI SQL (oracled as q50). md5 over xxhash64 is deliberate:
    * engine-portable, and hashing cost is noise next to the scan.
    */
  def byHash(df: DataFrame, keyCol: String, rate: Double, salt: Long = 0L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    // null keys are EXCLUDED explicitly (a null key has no stable
    // identity to sample on — rate=1.0 keeps every non-null-key row);
    // coalesce the key upstream to opt nulls in
    df.filter(col(keyCol).isNotNull &&
      hashBucket(keyCol, salt) < (rate * (1L << 20)).toLong)
  }

  /** The md5 bucket both sampling forms share: first 5 hex digits of
    * `md5(key || '|' || salt)` as a uniform long in [0, 2^20).
    */
  def hashBucket(keyCol: String, salt: Long = 0L): org.apache.spark.sql.Column =
    conv(substring(
      md5(concat(col(keyCol).cast("string"), lit("|"), lit(salt.toString))),
      1, 5), 16, 10).cast("long")

  /** ⊕ Deterministic weighted sample WITHOUT replacement
    * (Efraimidis–Spirakis A-Res): per group, keep the `k` rows with
    * the largest priority `ln(h)/w`, where `h` is the key's
    * [[hashBucket]] mapped into (0,1) — the order-equivalent log form
    * of the classic `h^(1/w)` key (both monotone: larger weight pulls
    * the priority toward 0). Inclusion probability is proportional to
    * weight, and the sample is REPRODUCIBLE: same keys + salt → same
    * sample under any partitioning or cluster size, which Bernoulli
    * `rand()` sampling cannot promise (the quality-weighted curation
    * draw a 100 TB corpus rerun must be able to repeat).
    *
    * Rows with null keys or non-positive/null weights are excluded —
    * a weight of 0 has no well-defined inverse and a null key no
    * stable identity. One shuffle (the per-group top-k window, rank
    * pushed map-side by WindowGroupLimit); the weight column is any
    * expression (quality score, token count, dedup-cluster size).
    */
  def weightedSample(df: DataFrame, groupCols: Seq[org.apache.spark.sql.Column],
                     keyCol: String, weight: org.apache.spark.sql.Column,
                     k: Int, salt: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = (hashBucket(keyCol, salt).cast("double") + 0.5) / (1L << 20).toDouble
    val pri = log(h) / weight
    graft.ops.TopK.perGroupTopK(
        df.filter(col(keyCol).isNotNull && weight.isNotNull && weight > 0)
          .withColumn("__pri", pri),
        groupCols, Seq(desc("__pri"), asc(keyCol)), k)
      .drop("__pri")
  }

  /** ⊕ Deterministic train/val/test split assignment: the key's
    * [[hashBucket]] falls into cumulative weight ranges and the row
    * gets that split's label — the reproducibility contract a 100 TB
    * training corpus needs (same key → same split on every rerun,
    * any partitioning, and CONSISTENTLY across tables sharing the
    * key, so features and labels never straddle a split). Null keys
    * get a null label.
    *
    * @param splits (label, weight) in order; weights must sum to 1
    *               within 1e-9 so every bucket is covered
    */
  def assignSplit(keyCol: String, splits: Seq[(String, Double)],
                  salt: Long = 0L): org.apache.spark.sql.Column = {
    require(splits.nonEmpty, "assignSplit needs at least one split")
    require(splits.forall(_._2 >= 0), "split weights must be non-negative")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val m = (1L << 20).toDouble
    val bucket = hashBucket(keyCol, salt)
    // cumulative upper bounds; the last split takes everything left so
    // floating-point edge crumbs can't leave a bucket unlabeled
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val bounded = splits.map(_._1).zip(cum.map(c => math.round(c * m)))
    val cases = bounded.init.foldRight(lit(bounded.last._1): org.apache.spark.sql.Column) {
      case ((label, hi), rest) => when(bucket < hi, lit(label)).otherwise(rest)
    }
    when(col(keyCol).isNotNull, cases)
  }

  /** ⊕ Deterministic data-mixture sampling: draw each source at the
    * rate that makes the kept set approximate the target mixture —
    * `rate_s = min(1, share_s · totalN / count_s)` — using the
    * reproducible [[hashBucket]] membership test (q50's predicate),
    * so the same corpus + salt always yields the same mixture (The
    * Pile/ROOTS-style source weighting, executable). Sources not in
    * `shares` are EXCLUDED (an unlisted source has no target rate —
    * same explicitness as `applyChanges`' op-code validation).
    *
    * Plan shape: one count aggregation per run (tiny result,
    * broadcast back onto the corpus), then a shuffle-free row-local
    * filter — the corpus never re-shuffles. An over-requested source
    * (share·totalN > count) caps at rate 1 and under-delivers;
    * callers that need exact counts per source should draw with
    * [[weightedSample]]'s top-k instead (bounded but one shuffle).
    */
  def mixtureSample(df: DataFrame, sourceCol: org.apache.spark.sql.Column,
                    keyCol: String,
                    shares: Seq[(String, Double)], totalN: Long,
                    salt: Long = 0L): DataFrame = {
    require(shares.nonEmpty, "mixtureSample needs at least one share")
    require(shares.forall(_._2 > 0), "shares must be positive")
    val shareCol = shares.foldLeft(lit(null).cast("double")) {
      case (acc, (s, w)) => when(col("__src") === s, lit(w)).otherwise(acc)
    }
    // least() SKIPS nulls (both engines), so the unlisted-source null
    // must be decided BEFORE the cap or it silently becomes rate 1.0
    val rates = df.groupBy(sourceCol.as("__src")).agg(count(lit(1)).as("__cnt"))
      .select(col("__src"),
        when(shareCol.isNotNull,
          least(lit(1.0), shareCol * totalN / col("__cnt"))).as("__rate"))
      .filter(col("__rate").isNotNull)
    df.join(broadcast(rates), sourceCol === col("__src"))
      .filter(hashBucket(keyCol, salt) <
        floor(col("__rate") * (1L << 20).toDouble).cast("long"))
      .drop("__src", "__rate")
  }

  /** ⊕ Temperature-weighted mixture sampling — [[mixtureSample]] with
    * the target shares DERIVED from the corpus itself:
    * `share_s ∝ count_s^alpha` (the multilingual-LLM α-sampling rule,
    * XLM-R lineage: α < 1 upsamples the tail relative to the head so
    * low-resource sources are not drowned, without hand-written share
    * tables that go stale as the corpus drifts).
    *
    * Plan shape: one count aggregation (source-cardinality rows), the
    * weight/total attached as a single-row broadcast normalizer, then
    * the same shuffle-free row-local [[hashBucket]] membership filter
    * — the corpus never re-shuffles and nothing is collected.
    *
    * Determinism (the oracle contract): weights are quantized to
    * integer MICRO-units (`round(count^α · 1e6)`) so the total is an
    * exact order-free integer sum; the rate is then computed in
    * DOUBLE from the start (`w·totalN` would overflow a long at
    * 100 TB source sizes) — every operand converts exactly and IEEE
    * multiply/divide are correctly rounded, so both engines land on
    * the identical double. The α = 0.5 default uses `sqrt`
    * (IEEE-exact) rather than `pow`. Rates cap at 1 (an
    * over-requested source under-delivers, the mixtureSample stance).
    */
  def temperatureMixture(df: DataFrame, sourceCol: org.apache.spark.sql.Column,
                         keyCol: String, totalN: Long, alpha: Double = 0.5,
                         salt: Long = 0L): DataFrame = {
    require(totalN > 0, "totalN must be positive")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val wExpr =
      if (alpha == 0.5) round(sqrt(col("__cnt")) * 1e6, 0).cast("long")
      else round(pow(col("__cnt"), alpha) * 1e6, 0).cast("long")
    val counts = df.groupBy(sourceCol.as("__src"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__w", wExpr)
    val total = counts.agg(sum(col("__w")).as("__S"))
    val rates = counts.crossJoin(broadcast(total))
      .select(col("__src"),
        least(lit(1.0),
          (col("__w").cast("double") * totalN) /
            (col("__S").cast("double") * col("__cnt")))
          .as("__rate"))
    df.join(broadcast(rates), sourceCol === col("__src"))
      .filter(hashBucket(keyCol, salt) <
        floor(col("__rate") * (1L << 20).toDouble).cast("long"))
      .drop("__src", "__rate")
  }

  /** ⊕ Exact per-source token-budget selection — the "fill a 10B-token
    * budget" cut that rate-based [[mixtureSample]] can only
    * approximate: docs are taken per source in deterministic id
    * order, each kept iff the tokens consumed BEFORE it are still
    * under that source's budget (the
    * [[graft.streaming.EventStream.quotaSampleStream]] rule, so the
    * batch cut ≡ the streaming quota on the same arrival order —
    * QuotaSpec proves it). Output: kept docs with
    * `tok_start_in_source` (the exclusive per-source token prefix),
    * which is also the doc's offset in the source's token stream.
    *
    * Scale shape: built on [[graft.ops.Ids.prefixSum]]'s two-pass
    * range-partition prefix sum over the GLOBAL (source, id) order —
    * per-source cumulative = global prefix − the source's first
    * prefix (one tiny groupBy, broadcast back). NO per-source window:
    * a window partitioned by source would funnel each source — there
    * may be only a handful at 100 TB — through a single task.
    * Sources without a budget row are dropped (the mixtureSample
    * unlisted-source stance); budgets are model-sized driver state.
    */
  def tokenBudgetSample(df: DataFrame, sourceCol: org.apache.spark.sql.Column,
                        idCol: org.apache.spark.sql.Column,
                        tokenCol: org.apache.spark.sql.Column,
                        budgets: Seq[(String, Long)]): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetSample needs at least one budget")
    require(budgets.forall(_._2 >= 0), "budgets must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val pre = df.select(sourceCol.as("source"), idCol.as("doc_id"),
      tokenCol.cast("long").as("n_toks"))
    val summed = graft.ops.Ids.prefixSum(pre,
      Seq(col("source"), col("doc_id")), "n_toks", "__gcum")
    val offs = summed.groupBy(col("source")).agg(min(col("__gcum")).as("__off"))
    val budgetDf = budgets.toDF("source", "__budget")
    summed
      .join(broadcast(offs), Seq("source"))
      .join(broadcast(budgetDf), Seq("source"))
      .filter(col("__gcum") - col("__off") < col("__budget"))
      .select(col("source"), col("doc_id"), col("n_toks"),
        (col("__gcum") - col("__off")).as("tok_start_in_source"))
  }

  /** ⊕ Epoch allocation under a token budget — the data-constrained
    * mixing plan (Muennighoff et al. 2023, "Scaling Data-Constrained
    * Language Models": repeating data up to ~4 epochs is nearly as
    * good as fresh data; beyond that returns decay fast, hence the
    * epoch CAP). Given per-source available tokens t_s, a total
    * training budget B, temperature-α mixing weights w_s = t_s^α
    * (integer micro-units — the [[temperatureMixture]] quantization),
    * and `maxEpochs` E, allocate
    *
    *   drawn_s = min(λ·w_s, E·t_s)   with λ s.t. Σ drawn_s = B
    *
    * — WATER-FILLING: small sources saturate at their epoch cap and
    * their unused share redistributes to the rest, which plain
    * proportional allocation gets wrong the moment any source caps.
    * λ is found exactly in one pass: sort sources by saturation point
    * r_s = cap_s/w_s, prefix-sum caps and weights, test the candidate
    * level λ_k = (B − Σ_{j<k} cap_j)/Σ_{j≥k} w_j for each boundary k
    * (valid iff r_{k−1} ≤ λ_k < r_k; B ≥ Σ cap ⇒ no valid row ⇒
    * everything caps). The windows run over the SOURCE table —
    * model-sized state (handfuls to thousands of rows), the one place
    * a single-task window is the documented right call; the corpus
    * itself is touched only by the per-source token sum.
    *
    * EVERY DECISION RIDES EXACT INTEGERS — no double anywhere between
    * the token sums and the verdicts. The r14/r15 driver reds proved
    * why publish-level integerization alone is not enough: at the
    * sf0.01 fixture the double λ-validity predicate sat 3e-8 from its
    * boundary and `round(λ·w)` 4e-4 from .5, so an environment whose
    * fp path lands a whisker to the other side flips `tokens_drawn`
    * for every uncapped source at once. Concretely, for the default
    * α = ½ (all arithmetic DECIMAL(38,0); every `div`/`pmod` operand
    * below is non-negative, so truncating `div` IS floor — identical
    * to DuckDB `//` on the same integers):
    *  - w = isqrt(t·10¹²) — exact integer square root: a double
    *    guess ⌊√t·10⁶⌋, then ±2 integer adjustment, which converges
    *    to the true floor on ANY engine whose guess lands within ±2
    *    (the guess's total fp error is < 1), so the result is
    *    engine-independent, unlike round(√t·10⁶);
    *  - cap = ⌊(2·t·E₆ + 10⁶) / (2·10⁶)⌋ with E₆ = round(E·10⁶)
    *    exact on the driver — the half-up of t·E in integers;
    *  - the sort key is qr = ⌊cap·10¹⁸/w⌋, kept DECIMAL (qr exceeds
    *    a long once r > ~9.2), tie-broken by source;
    *  - λ validity is CROSS-MULTIPLIED: with rem = B − prefCap and
    *    d = totW − prefW (> 0), valid ⇔ rem·w_prev ≥ cap_prev·d AND
    *    rem·w < cap·d; the first row takes (cap_prev, w_prev) =
    *    (0, 1) so its test degrades to rem ≥ 0, the λ ≥ 0 floor;
    *  - the unique valid boundary's (rem*, d*) is selected by
    *    min-over-struct (rem strictly decreases down the order, so
    *    lexicographic min = the same row for both fields on any
    *    engine);
    *  - capped ⇔ no valid boundary (B ≥ Σ cap) or cap·d* ≤ rem*·w;
    *  - the draw is half-up in integers:
    *    min(cap, ⌊(2·rem*·w + d*) / (2·d*)⌋) = min(cap, round(λ·w)).
    * α ≠ ½ keeps the documented double-quantized weight
    * round(t^α·10⁶) — t^α has no exact integer form; callers who
    * need engine-proof verdicts use the default.
    *
    * Output per source: `n_tokens`, `weight`, `tokens_drawn`,
    * `epochs_ppm` (= ⌊10⁶·drawn/t⌋, ≤ 10⁶·E by construction —
    * INTEGER parts-per-million in decimal(38,0), engine-stable at
    * any corpus size), `capped`.
    * Σ tokens_drawn = B up to per-source half-up rounding
    * of λ·w_s (exact when everything caps ⇒ Σ = Σ cap < B).
    */
  def epochAllocation(df: DataFrame, sourceCol: org.apache.spark.sql.Column,
                      tokenCol: org.apache.spark.sql.Column, budget: Long,
                      maxEpochs: Double = 4.0, alpha: Double = 0.5): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    def asDec(c: org.apache.spark.sql.Column) = c.cast(dec)
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("div", a, b)
    val wExpr =
      if (alpha == 0.5) {
        val n = asDec(col("t")) * lit(1000000000000L).cast(dec)
        val g0 = greatest(floor(sqrt(col("t").cast("double")) * 1e6).cast(dec),
          lit(0L).cast(dec))
        def down(g: org.apache.spark.sql.Column) =
          when(g * g > n, g - lit(1L).cast(dec)).otherwise(g)
        def up(g: org.apache.spark.sql.Column) = {
          val g1 = g + lit(1L).cast(dec)
          when(g1 * g1 <= n, g1).otherwise(g)
        }
        up(up(down(down(g0))))
      } else asDec(round(pow(col("t").cast("double"), alpha) * 1e6, 0).cast("long"))
    val e6: Long =
      BigDecimal(maxEpochs).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.movePointRight(6).longValueExact()
    val src = df.groupBy(sourceCol.as("source"))
      .agg(sum(tokenCol.cast("long")).as("t"))
      .withColumn("w", wExpr)
      .withColumn("cap",
        asDec(idiv(asDec(col("t")) * lit(2L * e6).cast(dec) + lit(1000000L).cast(dec),
          lit(2000000L).cast(dec))))
      // the sort key ⌊cap·10¹⁸/w⌋: the pmod subtraction makes the
      // decimal division exact (integral quotient), and it STAYS
      // decimal — the quotient exceeds a long once cap/w > ~9.2
      .withColumn("__capS", col("cap") * lit(1000000000000000000L).cast(dec))
      .withColumn("__qr", (col("__capS") - pmod(col("__capS"), col("w"))) / col("w"))
    // everything below the per-source aggregate rides ONE window stage
    // over the source table — re-referencing `src` from separate
    // aggregates would re-run the corpus scan once per reference
    // (PlansSpec pins the single-scan shape)
    val ord = Window.orderBy(col("__qr"), col("source"))
    val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = src
      .withColumn("__rem",
        lit(budget).cast(dec) - asDec(coalesce(sum(col("cap")).over(pre), lit(0L))))
      .withColumn("__d",
        asDec(sum(col("w")).over(full)) -
          asDec(coalesce(sum(col("w")).over(pre), lit(0L))))
      .withColumn("__lagCap", asDec(coalesce(lag(col("cap"), 1).over(ord), lit(0L))))
      .withColumn("__lagW", asDec(coalesce(lag(col("w"), 1).over(ord), lit(1L))))
      .withColumn("__valid",
        col("__rem") * col("__lagW") >= col("__lagCap") * col("__d") &&
          col("__rem") * col("w") < col("cap") * col("__d"))
      // min over the full window skips nulls; null = no valid
      // boundary = budget >= sum of caps = everything caps
      .withColumn("__lamPair",
        min(when(col("__valid"), struct(col("__rem"), col("__d")))).over(full))
      .withColumn("__lamRem", col("__lamPair").getField("__rem"))
      .withColumn("__lamD", col("__lamPair").getField("__d"))
    val capped = col("__lamRem").isNull ||
      col("cap") * col("__lamD") <= col("__lamRem") * col("w")
    val halfUp = asDec(idiv(
      lit(2L).cast(dec) * col("__lamRem") * col("w") + col("__lamD"),
      lit(2L).cast(dec) * col("__lamD")))
    ranked
      .select(col("source"), col("t").as("n_tokens"),
        col("w").cast("long").as("weight"),
        when(capped, col("cap")).otherwise(least(col("cap"), halfUp))
          .cast("long").as("tokens_drawn"),
        capped.as("capped"))
      .withColumn("epochs_ppm",
        expr("(CAST(tokens_drawn AS DECIMAL(38,0)) * 1000000) div n_tokens"))
      .select(col("source"), col("n_tokens"), col("weight"),
        col("tokens_drawn"), col("epochs_ppm"), col("capped"))
  }
}
