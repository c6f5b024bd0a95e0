package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ⊕ Tie-free ratio publishing (the q229/q205 double-rounding class,
  * generalized after the round-15 guard-band sweep found 13 more
  * boundary-sitting `round(ratio, k)` publish columns).
  *
  * `round(num/den, k)` on a double is environment-fragile exactly
  * when the true ratio lands ON a `.5·10⁻ᵏ` boundary: the verdict is
  * then pure tie-rule CONVENTION (Spark BigDecimal HALF_UP vs DuckDB
  * half-away vs numpy banker's — these genuinely differ across
  * engine versions), and corpus ratios of small integers land on
  * such boundaries constantly (13/128, 19/32, …). Floor division has
  * no convention: every exactly-computed input has a unique answer
  * on every engine. So publish
  *
  *   ratio(num, den, k) = floor(num·10ᵏ / den) / 10ᵏ
  *
  * with the floor taken over EXACT INTEGERS (never a double): the
  * resulting double is bit-determined (an integer ≤ 10ᵏ·|ratio|
  * divided by 10ᵏ — one IEEE division, deterministic everywhere),
  * schema-compatible with the rounded form it replaces, and the
  * DuckDB replay is literally `(num * 10^k) // den / 10^k.0`.
  *
  * Negative numerators floor (not truncate) via the pmod identity —
  * the repo's standing cross-engine floor-division convention
  * (DuckDB `//` floors; Spark `div` truncates; `a - pmod(a,b)` makes
  * them agree).
  */
object Exact {

  /** floor(num·10ᵏ / den) as a long — exact integer floor division.
    * Inputs must be integral columns (cast upstream); a zero/null
    * denominator yields null (Spark division semantics). The scale
    * multiply rides DECIMAL(38,0), NOT long: this helper is the
    * generic publish path, and a corpus-scale numerator (a 100 TB
    * token sum is ~2.5e13; ·10⁹ = 2.5e22) would wrap a plain long
    * multiply SILENTLY in non-ANSI Spark — a confidently wrong
    * published value, the worst failure mode. Only the final
    * quotient (the published ratio·10ᵏ, small by contract) casts
    * back to long.
    */
  def ratioUnits(num: Column, den: Column, k: Int): Column = {
    require(k >= 0 && k <= 9, s"scale must be in [0, 9], got $k")
    val dec = "decimal(38,0)"
    val scaled = num.cast(dec) * lit(math.pow(10, k).toLong).cast(dec)
    val d = den.cast(dec)
    val safeDen = when(d === 0L, lit(null).cast(dec)).otherwise(d)
    call_function("div", scaled - pmod(scaled, safeDen), safeDen)
  }

  /** The tie-free published ratio: [[ratioUnits]] / 10ᵏ as a double —
    * drop-in schema replacement for `round(num/den, k)`.
    */
  def ratio(num: Column, den: Column, k: Int): Column =
    ratioUnits(num, den, k).cast("double") / lit(math.pow(10, k))
}
