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
    * (valid iff lag(r) ≤ λ_k < r_k; B ≥ Σ cap ⇒ no valid row ⇒
    * everything caps). The windows run over the SOURCE table —
    * model-sized state (handfuls to thousands of rows), the one place
    * a single-task window is the documented right call; the corpus
    * itself is touched only by the per-source token sum.
    *
    * Output per source: `n_tokens`, `weight`, `tokens_drawn`,
    * `epochs_ppm` (= ⌊10⁶·drawn/t⌋, ≤ 10⁶·E by construction —
    * INTEGER parts-per-million, never a rounded double: a float64
    * ratio rounded at k dp lands on a .5 boundary eventually and the
    * verdict then depends on the reader's decimal library, whereas
    * floor division of exact integers is engine- and
    * environment-stable; the multiply rides decimal(38,0) so it
    * cannot overflow at any corpus size), `capped`.
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
    val wExpr =
      if (alpha == 0.5) round(sqrt(col("t").cast("double")) * 1e6, 0).cast("long")
      else round(pow(col("t").cast("double"), alpha) * 1e6, 0).cast("long")
    val src = df.groupBy(sourceCol.as("source"))
      .agg(sum(tokenCol.cast("long")).as("t"))
      .withColumn("w", wExpr)
      .withColumn("cap", round(col("t").cast("double") * maxEpochs, 0).cast("long"))
      .withColumn("r", col("cap").cast("double") / col("w").cast("double"))
    // everything below the per-source aggregate rides ONE window stage
    // over the source table — re-referencing `src` from separate
    // aggregates would re-run the corpus scan once per reference
    // (PlansSpec pins the single-scan shape)
    val ord = Window.orderBy(col("r"), col("source"))
    val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = src
      .withColumn("__prefCap", coalesce(sum(col("cap")).over(pre), lit(0L)))
      .withColumn("__prefW", coalesce(sum(col("w")).over(pre), lit(0L)))
      .withColumn("__prevR", coalesce(lag(col("r"), 1).over(ord), lit(0.0)))
      .withColumn("__totW", sum(col("w")).over(full))
      .withColumn("__cand",
        (lit(budget.toDouble) - col("__prefCap").cast("double")) /
          (col("__totW") - col("__prefW")).cast("double"))
      // min over the full window skips nulls; null lam = no valid
      // boundary = budget >= sum of caps = everything caps
      .withColumn("__lam",
        min(when(col("__cand") >= col("__prevR") && col("__cand") < col("r"),
          col("__cand"))).over(full))
    ranked
      .select(col("source"), col("t").as("n_tokens"), col("w").as("weight"),
        when(col("__lam").isNull || col("r") <= col("__lam"), col("cap"))
          .otherwise(least(col("cap"),
            round(col("__lam") * col("w").cast("double"), 0).cast("long")))
          .as("tokens_drawn"),
        (col("__lam").isNull || col("r") <= col("__lam")).as("capped"))
      // both operands are non-negative, so integral `div` (truncation)
      // IS floor division — identical to DuckDB `//` on the same ints
      .withColumn("epochs_ppm",
        expr("(CAST(tokens_drawn AS DECIMAL(38,0)) * 1000000) div n_tokens"))
      .select(col("source"), col("n_tokens"), col("weight"),
        col("tokens_drawn"), col("epochs_ppm"), col("capped"))
  }
}
