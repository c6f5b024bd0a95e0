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
    val bucket = conv(substring(
        md5(concat(col(keyCol).cast("string"), lit("|"), lit(salt.toString))),
        1, 5), 16, 10).cast("long")
    // null keys are EXCLUDED explicitly (a null key has no stable
    // identity to sample on — rate=1.0 keeps every non-null-key row);
    // coalesce the key upstream to opt nulls in
    df.filter(col(keyCol).isNotNull && bucket < (rate * (1L << 20)).toLong)
  }
}
