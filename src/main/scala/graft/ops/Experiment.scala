package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B experiment readout over an event log — the measurement layer
  * for the audience experiments the reference's community-discovery
  * flow feeds (reference `app.py` surfaces audiences; deciding whether
  * a treatment shown to one moved a metric is the immediate next
  * question, and nothing there answers it).
  *
  * Variant assignment reuses [[Sampling.assignSplit]]'s md5-bucket
  * contract: same user → same arm on every rerun, any partitioning,
  * consistently across tables — the property an experiment log
  * replayed at 100 TB must keep, and the reason assignment is a
  * deterministic hash rather than a stored table (no join against an
  * assignment dimension, no risk of the dimension drifting between
  * exposure and conversion scans).
  */
object Experiment {

  /** Per-exposed-user (variant, converted 0/1) — the shared front of
    * every readout here: one hash aggregation of the event scan on
    * the user key (min/max partials combine map-side), a row-local
    * hash assignment, and the strictly-after conversion rule ("any
    * conversion after t" ⟺ "last conversion after t", so the carry
    * is two timestamps however many events a user has).
    */
  private def exposedUsers(events: DataFrame, userKey: String, tsCol: Column,
                           typeCol: Column, exposureType: String,
                           conversionType: String,
                           variants: Seq[(String, Double)],
                           salt: Long): DataFrame = {
    require(exposureType != conversionType,
      "exposure and conversion types must differ (a self-converting " +
        "exposure makes the strictly-after rule vacuous)")
    events
      .filter(col(userKey).isNotNull && tsCol.isNotNull)
      .groupBy(col(userKey))
      .agg(
        min(when(typeCol === exposureType, tsCol)).as("__t_exp"),
        max(when(typeCol === conversionType, tsCol)).as("__t_conv_last"))
      .filter(col("__t_exp").isNotNull)
      .select(
        Sampling.assignSplit(userKey, variants, salt).as("__variant"),
        // null __t_conv_last (no conversion at all) → null > t → when
        // falls through to 0, exactly the CASE WHEN mirror in SQL
        when(col("__t_conv_last") > col("__t_exp"), lit(1))
          .otherwise(lit(0)).as("__conv"))
  }

  /** ⊕ Two-arm conversion readout: users are exposed if they have at
    * least one `exposureType` event, converted if any
    * `conversionType` event lands STRICTLY after their first
    * exposure (a conversion that precedes — or ties — first exposure
    * cannot have been caused by it), and assigned to
    * control/treatment by the deterministic user-key hash.
    *
    * Returns ONE row: per-arm exposed/converted counts and rates,
    * the absolute lift, and the pooled two-proportion z statistic
    *   z = (p_t − p_c) / sqrt(p̂(1−p̂)(1/n_c + 1/n_t)),
    * positive when treatment converts more. Rates/lift/z are rounded
    * at 9 (cross-partition double determinism). Degenerate readouts
    * are null, never an ANSI divide-by-zero: each rate needs its arm
    * non-empty, and z additionally needs the pooled rate strictly
    * inside (0, 1) — if everyone (or no one) converts the statistic
    * is undefined (the guards are integer comparisons so the oracle
    * mirrors them exactly).
    *
    * Shape: ONE hash aggregation of the event scan on the user key —
    * min/max partials combine map-side, so the shuffle carries one
    * row per user per partition, never the event log — then a
    * row-local hash assignment and a single-row final aggregation.
    * The conversion-after-exposure test needs only two timestamps
    * per user (first exposure, last conversion: "any conversion
    * after t" ⟺ "last conversion after t"), the same bounded-carry
    * convention as [[Funnel.funnelSteps]].
    */
  def abTest(events: DataFrame, userKey: String, tsCol: Column,
             typeCol: Column, exposureType: String, conversionType: String,
             controlLabel: String = "control",
             treatmentLabel: String = "treatment",
             treatmentShare: Double = 0.5, salt: Long = 0L): DataFrame = {
    require(treatmentShare > 0 && treatmentShare < 1,
      s"treatmentShare must be in (0, 1), got $treatmentShare")
    val perUser = exposedUsers(events, userKey, tsCol, typeCol, exposureType,
      conversionType,
      Seq(controlLabel -> (1.0 - treatmentShare), treatmentLabel -> treatmentShare),
      salt)
    val counts = perUser.agg(
      sum(when(col("__variant") === controlLabel, lit(1)).otherwise(lit(0)))
        .as("n_control"),
      sum(when(col("__variant") === controlLabel, col("__conv")).otherwise(lit(0)))
        .as("conv_control"),
      sum(when(col("__variant") === treatmentLabel, lit(1)).otherwise(lit(0)))
        .as("n_treatment"),
      sum(when(col("__variant") === treatmentLabel, col("__conv")).otherwise(lit(0)))
        .as("conv_treatment"))
    // identical expression tree in the oracle SQL: doubles cast before
    // every division, z guarded on both arms non-empty
    val nc = col("n_control").cast("double")
    val nt = col("n_treatment").cast("double")
    val cc = col("conv_control").cast("double")
    val ct = col("conv_treatment").cast("double")
    val pc = cc / nc
    val pt = ct / nt
    val pp = (cc + ct) / (nc + nt)
    val z = (pt - pc) / sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / nc + lit(1.0) / nt))
    val bothArms = col("n_control") > 0 && col("n_treatment") > 0
    val mixedOutcome = // 0 < p̂ < 1, as exact integer comparisons
      (col("conv_control") + col("conv_treatment")) > 0 &&
        (col("conv_control") + col("conv_treatment")) <
          (col("n_control") + col("n_treatment"))
    counts.select(
      col("n_control"), col("conv_control"),
      when(col("n_control") > 0, round(pc, 9)).as("rate_control"),
      col("n_treatment"), col("conv_treatment"),
      when(col("n_treatment") > 0, round(pt, 9)).as("rate_treatment"),
      when(bothArms, round(pt - pc, 9)).as("lift"),
      when(bothArms && mixedOutcome, round(z, 9)).as("z_score"))
  }

  /** ⊕ k-arm conversion readout: Pearson chi-square over the
    * arms × {converted, not} contingency table — the test [[abTest]]
    * can't express once an experiment has more than two variants.
    * One row per observed arm: counts, rate, expected conversions
    * under homogeneity, the arm's chi-square contribution, and the
    * shared statistic/dof (a window sum over the k-row readout, not
    * the event log). Doubles rounded at 9; contributions and the
    * statistic are null when the pooled outcome is degenerate
    * (nobody or everybody converted — expected counts of 0 make the
    * test undefined), guarded by integer comparisons the oracle
    * mirrors exactly.
    *
    * Same shape as [[abTest]]: the event scan aggregates once on the
    * user key; everything after operates on k rows.
    */
  def chiSquare(events: DataFrame, userKey: String, tsCol: Column,
                typeCol: Column, exposureType: String, conversionType: String,
                variants: Seq[(String, Double)], salt: Long = 0L): DataFrame = {
    require(variants.size >= 2, "chiSquare needs at least two arms")
    val perUser = exposedUsers(events, userKey, tsCol, typeCol, exposureType,
      conversionType, variants, salt)
    val byArm = perUser.groupBy(col("__variant").as("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("__conv")).as("n_conv"))
    val all = Window.partitionBy() // k rows total — never the event log
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // totals first, as plain columns: the degenerate-outcome guard on
    // the contribution must be a lazy row-local CASE (an ANSI divide
    // inside a window AGGREGATE argument evaluates unconditionally,
    // and windows can't nest), so contrib is staged before its sum
    val nD = col("n_users").cast("double")
    val cD = col("n_conv").cast("double")
    val e1 = nD * col("__totc").cast("double") / col("__totn").cast("double")
    val e0 = nD * (col("__totn") - col("__totc")).cast("double") /
      col("__totn").cast("double")
    val contrib = (cD - e1) * (cD - e1) / e1 +
      ((nD - cD) - e0) * ((nD - cD) - e0) / e0
    val mixed = col("__totc") > lit(0L) && col("__totc") < col("__totn")
    byArm
      .withColumn("__totn", sum(col("n_users")).over(all))
      .withColumn("__totc", sum(col("n_conv")).over(all))
      .withColumn("__contrib", when(mixed, contrib))
      .withColumn("rate", round(cD / nD, 9))
      .withColumn("exp_conv", when(mixed, round(e1, 9)))
      .withColumn("chi2_contrib", round(col("__contrib"), 9))
      .withColumn("chi2", round(sum(col("__contrib")).over(all), 9))
      .withColumn("dof", count(lit(1)).over(all) - lit(1L))
      .drop("__totn", "__totc", "__contrib")
  }

  /** ⊕ CUPED variance-reduced readout (Deng et al. 2013's control
    * variate, the standard trick for tightening experiment metrics):
    * each exposed user's post-period metric is adjusted by their
    * pre-period metric, `y′ = y − θ(x − x̄)` with
    * `θ = cov(x, y)/var(x)`, which strips the variance component
    * that pre-experiment behavior explains (ρ² of it) without
    * biasing any arm mean.
    *
    * Numerics are the part designed for a cross-engine (and
    * cross-partition) exact contract: the metric is quantized to
    * integer cents PER EVENT (`round(value·100)` — one deterministic
    * scalar op), so every aggregation in the plan is an INTEGER sum
    * — exact in any order, immune to the float-accumulation-order
    * nondeterminism that plagues distributed covariance. Per-user
    * squared/cross products are computed in decimal(19,0) — a
    * long·long product is at most 38 digits, so decimal(38,0) holds
    * it EXACTLY with no wrap at any per-user cent total (DuckDB's
    * BIGINT·BIGINT would error loudly past ~9.2e18 rather than
    * diverge silently) — then the corpus moment sums (Σx², Σxy, Σy²)
    * accumulate in decimal(38,0), mirroring DuckDB's sum(BIGINT) →
    * HUGEINT headroom;
    * θ and the adjusted means
    * convert to double ONCE and proceed through deterministic scalar
    * arithmetic, so the q137 oracle matches bit-for-bit before the
    * presentation rounding (6).
    *
    * Shape: the event scan aggregates once on the user key (the
    * [[abTest]] shuffle); per-arm moment sums reduce to k rows; the
    * corpus-wide moments are window sums over those k rows — the
    * event log is never re-scanned or re-shuffled.
    *
    * Per observed arm: user count, raw and adjusted post-period mean
    * (cents), plus the shared θ and ρ² (the variance fraction CUPED
    * removed). θ/ρ²/adjusted means are null when var(x) = 0 (no
    * pre-period signal to adjust with — x̄-centering would divide by
    * zero); ρ² additionally needs var(y) > 0.
    */
  def cuped(events: DataFrame, userKey: String, tsCol: Column,
            typeCol: Column, valueCol: Column, exposureType: String,
            metricType: String, cutover: String,
            variants: Seq[(String, Double)], salt: Long = 0L): DataFrame = {
    require(variants.size >= 2, "cuped needs at least two arms")
    val cut = to_timestamp(lit(cutover))
    val cents = round(valueCol * lit(100)).cast("long")
    val perUser = events
      .filter(col(userKey).isNotNull && tsCol.isNotNull)
      .groupBy(col(userKey))
      .agg(
        min(when(typeCol === exposureType, tsCol)).as("__t_exp"),
        coalesce(sum(when(typeCol === metricType && tsCol < cut, cents)),
          lit(0L)).as("__x"),
        coalesce(sum(when(typeCol === metricType && tsCol >= cut, cents)),
          lit(0L)).as("__y"))
      .filter(col("__t_exp").isNotNull)
      .select(Sampling.assignSplit(userKey, variants, salt).as("variant"),
        col("__x"), col("__y"))
    // cast BEFORE multiplying: a long·long product wraps silently in
    // Spark (non-ANSI) at >~9.2e18, but any product of two longs is at
    // most 38 digits, so decimal(19,0)·decimal(19,0) → decimal(38,0)
    // is exact — true headroom, matching DuckDB's HUGEINT moments
    def dec(c: Column) = c.cast("decimal(19,0)")
    val byArm = perUser.groupBy(col("variant")).agg(
      count(lit(1)).as("n_users"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum((dec(col("__x")) * dec(col("__x"))).cast("decimal(38,0)")).as("sxx"),
      sum((dec(col("__x")) * dec(col("__y"))).cast("decimal(38,0)")).as("sxy"),
      sum((dec(col("__y")) * dec(col("__y"))).cast("decimal(38,0)")).as("syy"))
    val all = Window.partitionBy() // k rows — never the event log
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def tot(c: Column) = sum(c).over(all).cast("double")
    val (n, tsx, tsy, tsxx, tsxy, tsyy) =
      (tot(col("n_users")), tot(col("sx")), tot(col("sy")),
        tot(col("sxx")), tot(col("sxy")), tot(col("syy")))
    val varX = n * tsxx - tsx * tsx   // n²·var — exact integers in double
    val varY = n * tsyy - tsy * tsy
    val cov = n * tsxy - tsx * tsy
    val theta = cov / varX
    val xbar = tsx / n
    val meanY = col("sy").cast("double") / col("n_users").cast("double")
    val meanX = col("sx").cast("double") / col("n_users").cast("double")
    byArm
      .withColumn("mean_post", round(meanY, 6))
      .withColumn("mean_post_adj",
        when(varX =!= lit(0.0), round(meanY - theta * (meanX - xbar), 6)))
      .withColumn("theta", when(varX =!= lit(0.0), round(theta, 6)))
      .withColumn("rho2", when(varX =!= lit(0.0) && varY =!= lit(0.0),
        round(cov * cov / (varX * varY), 6)))
      .select(col("variant"), col("n_users"), col("mean_post"),
        col("mean_post_adj"), col("theta"), col("rho2"))
  }
}
