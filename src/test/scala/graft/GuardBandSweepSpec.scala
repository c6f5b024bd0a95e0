package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Registry-wide ROUNDING GUARD-BAND sweep (the q229/q205 class, now
  * two driver reds in two rounds — q154 in r12, q205 in r14):
  *
  * Any published column of the form `round(<corpus-derived double
  * ratio>, k)` is environment-fragile when the unrounded value sits
  * ON (or within fp noise of) a `.5·10⁻ᵏ` boundary — Spark's
  * BigDecimal-HALF_UP-on-binary-double and the driver's
  * DuckDB/pandas readers then disagree on the last digit even though
  * both computed the "same" number. The registry's defenses are
  * (a) integer-exact readouts where possible (q187/q205 ppm
  * convention) and (b) for the ratios that stay doubles, fixture
  * values that sit FAR from every rounding boundary.
  *
  * This spec enforces (b) mechanically for the WHOLE registry: for
  * every query it walks the analyzed plan's publish surface (the
  * final Project/Aggregate, descending through Sort/Filter/Limit
  * wrappers and bare pass-through projections), finds each
  * `Alias(Round(child, k), name)` with 1 ≤ k ≤ 8, rewrites the scale
  * to 12 (so the collected value is the pre-publish ratio to 12
  * digits — boundary information at k intact), executes the widened
  * plan, and asserts every value's fractional position at scale k
  * clears the .5 boundary by a fp-noise-proof margin.
  *
  * The margin is ULP-AWARE, not a flat 1e-4: the divergence
  * mechanism is (a) a representable TIE — the pre-publish double IS
  * the nearest double to an exact `.5·10⁻ᵏ` boundary, so the verdict
  * is pure tie-rule convention (HALF_UP vs half-away vs banker's —
  * exactly what differs across Spark/DuckDB/numpy versions) — or
  * (b) recompute noise — the two engines reach the value through
  * slightly different fp paths and land on opposite sides, which
  * requires the distance to be within a few ULPs of the computation.
  * Both live at ULP scale of t = v·10ᵏ, so the band is
  * max(1e-7, 64·ulp(t)). A flat 1e-4 band was measured to flag ~30
  * float32-derived codec features whose distance is thousands of
  * ULPs (both engines widen the SAME float bits — deterministically
  * stable); those are not in the hazard class.
  *
  * Scope notes (deliberate):
  *  - ONLY publish-level rounds are widened. A `round` that feeds
  *    further computation (threshold comparisons, integer casts,
  *    grouping keys — e.g. every `ok_*` verdict, the water-fill's
  *    micro-unit weights) is an intentional quantization, covered by
  *    the per-query guard-band tests (q154/q214/q171 style), and
  *    widening it would CHANGE semantics — so a pass-through
  *    attribute is followed down only when nothing else references
  *    it and no Filter/Limit-gated-Sort consumes it on the way.
  *  - k = 0 rounds (integer quantizations) are out of scope: their
  *    output is exact integers, the class this sweep guards against
  *    cannot occur.
  *  - The sweep runs at sf0.001 and sf0.01 — the driver compares at
  *    sf0.01, and a boundary value is a property of the DATA, so the
  *    gate scale must be swept, not just the cheap one.
  */
class GuardBandSweepSpec extends SparkSuite {

  /** Boundary clearance demanded of t = v·10ᵏ: a few dozen ULPs
    * (tie-rule + recompute-noise proof) with an absolute floor for
    * tiny t where ulp underflows the meaningful scale.
    */
  private def minDistance(t: Double): Double =
    math.max(1e-7, 64 * math.ulp(t))

  /** Publish-level Round sites found in one query's plan. */
  private case class Sweep(plan: LogicalPlan, sites: Seq[(String, Int)])

  private object PublishRound {
    def unapply(e: Expression): Option[(Round, Int)] = e match {
      case r @ Round(_, Literal(k: Int, IntegerType), _) if k >= 1 && k <= 8 =>
        Some((r, k))
      case _ => None
    }
  }

  /** Rewrite publish-level rounds to scale 12, returning the widened
    * plan and the (column, original-k) inventory. `pending` tracks
    * output attributes still eligible for widening as we descend.
    */
  private def widen(plan: LogicalPlan): Sweep = {
    val found = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]

    def refCounts(exprs: Seq[Expression]): Map[ExprId, Int] =
      exprs.flatMap(_.collect { case a: AttributeReference => a.exprId })
        .groupBy(identity).map { case (id, xs) => id -> xs.size }

    def rewriteNamed(ne: NamedExpression,
                     pending: Map[ExprId, String]): NamedExpression = ne match {
      case a @ Alias(PublishRound(r, k), name) if pending.contains(a.exprId) =>
        found += ((name, k))
        Alias(r.copy(scale = Literal(12)), name)(a.exprId, a.qualifier,
          Some(a.metadata))
      case other => other
    }

    // attributes a defining node passes through untouched AND
    // unreferenced-elsewhere stay eligible below it
    def passThrough(list: Seq[NamedExpression],
                    pending: Map[ExprId, String]): Map[ExprId, String] = {
      val counts = refCounts(list)
      list.flatMap {
        case a: AttributeReference
            if pending.contains(a.exprId) && counts(a.exprId) == 1 =>
          Some(a.exprId -> pending(a.exprId))
        case al @ Alias(ref: AttributeReference, _)
            if pending.contains(al.exprId) && counts(ref.exprId) == 1 =>
          Some(ref.exprId -> pending(al.exprId))
        case _ => None
      }.toMap
    }

    def go(p: LogicalPlan, pending: Map[ExprId, String],
           underLimit: Boolean): LogicalPlan =
      if (pending.isEmpty) p
      else p match {
        case s: Sort =>
          // a Limit above makes sort order row-SELECTING: widening a
          // sort-key column would change which rows survive — drop
          // any pending attr the sort keys reference in that case
          val sortRefs = s.order.flatMap(_.collect {
            case a: AttributeReference => a.exprId }).toSet
          val next = if (underLimit) pending -- sortRefs else pending
          s.copy(child = go(s.child, next, underLimit))
        case f: Filter =>
          val condRefs = f.condition.collect {
            case a: AttributeReference => a.exprId }.toSet
          f.copy(child = go(f.child, pending -- condRefs, underLimit))
        case l: GlobalLimit => l.copy(child = go(l.child, pending, true))
        case l: LocalLimit => l.copy(child = go(l.child, pending, true))
        case s: SubqueryAlias => s.copy(child = go(s.child, pending, underLimit))
        case pj: Project =>
          val newList = pj.projectList.map(rewriteNamed(_, pending))
          pj.copy(projectList = newList,
            child = go(pj.child, passThrough(newList, pending), underLimit))
        case ag: Aggregate =>
          // publish-rounds can sit directly on aggregate outputs;
          // below an Aggregate the domain changes — stop descending
          ag.copy(aggregateExpressions =
            ag.aggregateExpressions.map(rewriteNamed(_, pending)))
        case other => other
      }

    val pending0 = plan.output.map(a => a.exprId -> a.name).toMap
    Sweep(go(plan, pending0, underLimit = false), found.toSeq)
  }

  private def sweepAt(dir: String): Unit = {
    val inventory = scala.collection.mutable.ArrayBuffer.empty[(String, String, Int)]
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    var checked = 0L
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val analyzed = fn(spark, dir).queryExecution.analyzed
      val Sweep(widened, sites) = widen(analyzed)
      if (sites.nonEmpty) {
        sites.foreach { case (c, k) => inventory += ((name, c, k)) }
        val df = org.apache.spark.sql.GraftTestPlans.ofRows(spark, widened)
        val cols = sites.map(_._1)
        val rows = df.selectExpr(cols.map(c => s"`$c`"): _*).collect()
        rows.foreach { row =>
          sites.zipWithIndex.foreach { case ((c, k), i) =>
            if (!row.isNullAt(i)) {
              val v = row.getDouble(i)
              if (!v.isNaN && !v.isInfinite) {
                checked += 1
                val t = v * math.pow(10, k)
                val f = t - math.floor(t)
                val d = math.abs(f - 0.5)
                if (d < minDistance(t)) violations +=
                  f"$name.$c = $v (pre-publish, round scale $k) sits $d%.2e from its .5 boundary (band ${minDistance(t)}%.2e)"
              }
            }
          }
        }
      }
    }
    info(s"swept ${inventory.map(_._1).distinct.size} queries / " +
      s"${inventory.size} rounded publish columns / $checked values at $dir")
    assert(violations.isEmpty,
      s"${violations.size} published value(s) at $dir sit within fp noise " +
        "of a .5 rounding boundary — the q229/q205 environment-fragile " +
        "class; publish an integer-exact readout (ppm convention) or an " +
        "exact-decimal type:\n  " + violations.distinct.mkString("\n  "))
    assert(inventory.nonEmpty, "sweep found no publish-level rounds — " +
      "the plan walker regressed (the registry has dozens)")
  }

  test("no published rounded double sits near a .5 boundary at sf0.001") {
    sweepAt(sfDir)
  }

  test("no published rounded double sits near a .5 boundary at sf0.01") {
    sweepAt("/root/testdata/sf0.01")
  }
}
