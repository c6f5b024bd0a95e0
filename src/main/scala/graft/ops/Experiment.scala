package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    require(exposureType != conversionType,
      "exposure and conversion types must differ (a self-converting " +
        "exposure makes the strictly-after rule vacuous)")
    val perUser = events
      .filter(col(userKey).isNotNull && tsCol.isNotNull)
      .groupBy(col(userKey))
      .agg(
        min(when(typeCol === exposureType, tsCol)).as("__t_exp"),
        max(when(typeCol === conversionType, tsCol)).as("__t_conv_last"))
      .filter(col("__t_exp").isNotNull)
      .select(
        Sampling.assignSplit(userKey,
          Seq(controlLabel -> (1.0 - treatmentShare),
            treatmentLabel -> treatmentShare), salt).as("__variant"),
        // null __t_conv_last (no conversion at all) → null > t → when
        // falls through to 0, exactly the CASE WHEN mirror in SQL
        when(col("__t_conv_last") > col("__t_exp"), lit(1))
          .otherwise(lit(0)).as("__conv"))
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
}
