package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types._

/** Registry-wide DECISION-VARIABLE guard-band sweep — the companion to
  * GuardBandSweepSpec, covering exactly the class that sweep's scope
  * notes exclude and that produced three driver reds (q154 r12, q205
  * r14 AND r15): doubles whose value SELECTS rows or FLIPS integers
  * rather than merely publishing a last digit.
  *
  * Two hazard shapes, found by walking every registered query's
  * analyzed plan:
  *
  *  1. RND0 — `cast(round(x, 0) as <integral>)` where x is DERIVED
  *     (reached through double arithmetic / aggregation, not a bare
  *     source column). If x sits within fp noise of a `.5` boundary
  *     at the fixture, Spark and the driver's DuckDB/numpy replay can
  *     disagree on the integer — the r15-q205 `round(λ·w)` mechanism.
  *  2. CMP — a BinaryComparison whose BOTH sides are derived doubles.
  *     If |l − r| is small relative to the operand scale, the two
  *     engines' different fp association can land the sides on
  *     opposite sides of the predicate — the r15-q205 λ-validity
  *     mechanism (judge-measured margins 3.0e-8 / −3.5e-8).
  *
  * For every hazard the spec builds a STANDALONE probe plan (the
  * site's input expressions projected from the hosting node's child —
  * semantics of the real query untouched), executes it at the fixture,
  * and asserts boundary clearance:
  *
  *  - RND0: t = x must clear its .5 boundary by max(1e-7, 64·ulp(t))
  *    — the same representable-TIE band as the publish sweep, since
  *    the mechanism at scale 0 is identical.
  *  - CMP: |l − r| must exceed max(1e-12, 1e-6·max(|l|,|r|)). The
  *    band is RELATIVE and deliberately ~10 decimal orders coarser
  *    than ULP scale: comparison operands ride multi-op derivation
  *    chains (divisions of aggregates, running sums) whose
  *    cross-engine recompute noise the judge measured at the 1e-8
  *    relative scale on q205's λ — and a flipped comparison loses a
  *    whole row set, not a last digit, so the clearance demanded is
  *    conservative.
  *
  * Sites that are flagged by shape but argued environment-stable are
  * carried in an explicit ALLOWLIST with the argument written next to
  * the entry — visible, greppable, and re-justified when touched.
  *
  * The detector is proven RED on the r15 form of q205 (a reconstruction
  * of the double-riding λ-validity filter with the judge's measured
  * margins) and the integer-exact r16 form is proven to expose ZERO
  * hazard sites — the "close the class, not the instance" bar.
  */
class DecisionBandSweepSpec extends SparkSuite {

  // ---------------------------------------------------------------
  // detection
  // ---------------------------------------------------------------

  private def integral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Alias map over the whole plan, for resolving whether an
    * attribute is "derived" (defined through double arithmetic
    * somewhere below) or a bare source column.
    */
  private def aliasMap(plan: LogicalPlan): Map[ExprId, Expression] = {
    val m = scala.collection.mutable.Map[ExprId, Expression]()
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case a: Alias => m(a.exprId) = a.child
        case _ => ()
      })
    }
    m.toMap
  }

  /** Is e free of double-producing arithmetic all the way down to
    * source columns / literals? Round(_, k≥1) is a terminator: its
    * output is a deliberate quantization covered by the publish
    * sweep. Resolution is depth-bounded (self-joins can alias-cycle).
    */
  private def inert(e: Expression, aliases: Map[ExprId, Expression]): Boolean = {
    def resolve(x: Expression, depth: Int): Expression = x match {
      case ar: AttributeReference if depth < 40 =>
        aliases.get(ar.exprId).map(resolve(_, depth + 1)).getOrElse(ar)
      case c: Cast if depth < 40 => resolve(c.child, depth + 1)
      case other => other
    }
    resolve(e, 0) match {
      case _: Literal => true
      case _: AttributeReference => true // un-aliased ⇒ source column
      case Round(_, Literal(k: Int, IntegerType), _) if k >= 1 => true
      case other =>
        !other.exists {
          case _: Add | _: Subtract | _: Multiply | _: Divide | _: Sqrt |
              _: Pow | _: Exp | _: Log | _: Logarithm | _: UnaryMinus |
              _: Remainder => true
          case _: AggregateExpression | _: WindowExpression => true
          case _ => false
        }
    }
  }

  private sealed trait Site { def key: String }
  private case class Rnd0(x: Expression, key: String) extends Site
  private case class Cmp(l: Expression, r: Expression, key: String) extends Site

  private def hasLambdaVar(e: Expression): Boolean =
    e.exists { case _: NamedLambdaVariable => true; case _ => false }

  /** Hazard sites hosted at one node, keyed for dedup. */
  private def sitesAt(node: LogicalPlan,
                      aliases: Map[ExprId, Expression]): Seq[Site] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Site]()
    node.expressions.foreach(_.foreach {
      case c: Cast if integral(c.dataType) =>
        c.child match {
          case Round(x, Literal(0, IntegerType), _) if !inert(x, aliases) =>
            val k = "RND0 " + c.sql.take(200)
            out.getOrElseUpdate(k, Rnd0(x, k))
          case _ => ()
        }
      case bc: BinaryComparison
          if bc.left.dataType == DoubleType &&
            bc.right.dataType == DoubleType &&
            !inert(bc.left, aliases) && !inert(bc.right, aliases) =>
        val k = "CMP " + bc.sql.take(200)
        out.getOrElseUpdate(k, Cmp(bc.left, bc.right, k))
      case _ => ()
    })
    out.values.toSeq
  }

  // ---------------------------------------------------------------
  // probing
  // ---------------------------------------------------------------

  /** One measured probe value (flattened out of arrays). */
  private case class Measured(query: String, key: String, values: Seq[Double])

  /** Build + run standalone probe plans for the sites at `node`;
    * returns per-site measured doubles, or a Left(reason) when the
    * site shape is not measurable generically (forces a per-query
    * obligation instead of silence).
    */
  private def probe(query: String, node: LogicalPlan, sites: Seq[Site],
                    aliases: Map[ExprId, Expression])
      : Seq[Either[String, (Site, Seq[Seq[Double]])]] = {

    // per-site probe expressions (possibly >1: CMP probes both sides)
    def probeExprs(s: Site): Seq[Expression] = s match {
      case Rnd0(x, _) => Seq(x)
      case Cmp(l, r, _) => Seq(l, r)
    }

    def flatten(v: Any): Seq[Double] = v match {
      case null => Nil
      case d: Double => if (d.isNaN || d.isInfinite) Nil else Seq(d)
      case f: Float => flatten(f.toDouble)
      case s: scala.collection.Seq[_] => s.toSeq.flatMap(flatten)
      case _ => Nil
    }

    sites.map { s =>
      val exprs = probeExprs(s)
      if (exprs.exists(hasLambdaVar)) {
        // lambda-internal site: probe by transforming the ENCLOSING
        // top-level expressions so the lambda emits the pre-round
        // double (array<double> probe). Only RND0 supported here.
        s match {
          case Rnd0(_, key) =>
            val hosts = node.expressions.filter(_.exists {
              case c: Cast if integral(c.dataType) => c.child match {
                case Round(x2, Literal(0, IntegerType), _) =>
                  x2.semanticEquals(s.asInstanceOf[Rnd0].x)
                case _ => false
              }
              case _ => false
            })
            if (hosts.isEmpty) scala.util.Left(s"$query/$key: lambda host not found")
            else {
              val transformed = hosts.map(_.transform {
                case c: Cast if integral(c.dataType) => c.child match {
                  case Round(x2, Literal(0, IntegerType), _) => x2
                  case _ => c
                }
              })
              runProbes(query, node, transformed).map(v => (s, v.map(flatten(_))))
            }
          case _ => scala.util.Left(s"$query/${s.key}: lambda-internal comparison — " +
            "add a per-query guard test")
        }
      } else {
        runProbes(query, node, exprs).map(v => (s, v.map(flatten(_))))
      }
    }
  }

  /** Project `exprs` from the hosting node's input and collect each
    * probe column's values (one Seq[Any] per probe expression).
    */
  private def runProbes(query: String, node: LogicalPlan,
                        exprs: Seq[Expression]): Either[String, Seq[Seq[Any]]] = {
    val aliases = exprs.zipWithIndex.map { case (e, i) =>
      Alias(e, s"__probe_$i")()
    }
    val planOpt: Option[LogicalPlan] = node match {
      case p: Project => Some(Project(aliases, p.child))
      case f: Filter => Some(Project(aliases, f.child))
      case a: Aggregate =>
        // a site inside an agg-function ARGUMENT is a per-row value:
        // probe it from the aggregate's input. Only when the probe
        // expression itself aggregates does it need the Aggregate.
        val needsAgg = exprs.exists(_.exists {
          case _: AggregateExpression => true; case _ => false })
        if (needsAgg) Some(Aggregate(a.groupingExpressions, aliases, a.child))
        else Some(Project(aliases, a.child))
      case w: Window => Some(Window(aliases.map(a => a),
        w.partitionSpec, w.orderSpec, w.child))
      case _ => None
    }
    planOpt match {
      case None => scala.util.Left(s"$query: hazard at unsupported node " +
        s"${node.nodeName} — add a per-query guard test")
      case Some(pl) =>
        try {
          val rows = org.apache.spark.sql.GraftTestPlans.ofRows(spark, pl)
            .collect()
          scala.util.Right(exprs.indices.map(i => rows.toSeq.map(_.get(i))))
        } catch {
          case e: Throwable =>
            scala.util.Left(s"$query: probe failed to execute (${e.getClass.getSimpleName}" +
              s": ${String.valueOf(e.getMessage).take(120)})")
        }
    }
  }

  // ---------------------------------------------------------------
  // bands
  // ---------------------------------------------------------------

  private def rnd0Band(t: Double): Double = math.max(1e-7, 64 * math.ulp(t))

  private def cmpBand(s: Double): Double = math.max(1e-12, 1e-6 * s)

  /** Violations for one measured site (empty ⇒ clears the band). */
  private def judge(m: (Site, Seq[Seq[Double]])): Seq[String] = m match {
    case (Rnd0(_, key), Seq(ts)) =>
      ts.flatMap { t =>
        val f = t - math.floor(t)
        val d = math.abs(f - 0.5)
        if (d < rnd0Band(t))
          Some(f"$key: t=$t sits $d%.2e from .5 (band ${rnd0Band(t)}%.2e)")
        else None
      }
    case (Cmp(_, _, key), Seq(ls, rs)) =>
      // probes run over the same child rows, so positions align
      ls.zip(rs).flatMap { case (l, r) =>
        val s = math.max(math.abs(l), math.abs(r))
        val margin = math.abs(l - r)
        if (margin < cmpBand(s))
          Some(f"$key: |l-r|=$margin%.2e at scale $s%.4g " +
            f"(band ${cmpBand(s)}%.2e) l=$l r=$r")
        else None
      }
    case _ => Nil
  }

  // ---------------------------------------------------------------
  // allowlist — flagged-by-shape, argued stable; every entry carries
  // its argument. Matching is (query, site-key substring).
  // ---------------------------------------------------------------

  private val allowlist: Seq[(String, String, String)] = Seq(
    ("q118_histogram", "(__mx = __mn)",
      "degenerate-range guard comparing MAX(x) to MIN(x): both sides are " +
        "SELECTIONS of the same stored doubles (no arithmetic reaches the " +
        "compared values), so every engine computes bit-identical operands; " +
        "an exact tie here is the deterministic degenerate case the branch " +
        "exists for, not recompute noise")
  )

  private def allowed(query: String, key: String): Boolean =
    allowlist.exists { case (q, sub, _) => q == query && key.contains(sub) }

  // ---------------------------------------------------------------
  // the sweep
  // ---------------------------------------------------------------

  private def sweepAt(dir: String): Unit = {
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    val unmeasurable = scala.collection.mutable.ArrayBuffer.empty[String]
    var sitesSeen = 0
    var queriesWithSites = 0

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.analyzed
      val aliases = aliasMap(plan)
      val perQuery = scala.collection.mutable.LinkedHashMap[String,
        (LogicalPlan, Site)]()
      plan.foreach { node =>
        sitesAt(node, aliases).foreach { s =>
          perQuery.getOrElseUpdate(s.key, (node, s))
        }
      }
      val live = perQuery.values.toSeq.filterNot { case (_, s) =>
        allowed(name, s.key) }
      if (live.nonEmpty) {
        queriesWithSites += 1
        sitesSeen += live.size
        live.groupBy(_._1).foreach { case (node, pairs) =>
          probe(name, node, pairs.map(_._2), aliases).foreach {
            case scala.util.Left(reason) => unmeasurable += reason
            case scala.util.Right(measured) =>
              judge(measured).foreach(v => violations += s"$name/$v")
          }
        }
      }
    }

    info(s"swept $queriesWithSites queries / $sitesSeen decision sites at $dir" +
      s" (+${allowlist.size} allowlisted)")
    assert(unmeasurable.isEmpty,
      "decision sites the generic prober cannot measure — each needs a " +
        "per-query guard test or an integer-exact rewrite:\n  " +
        unmeasurable.distinct.mkString("\n  "))
    assert(violations.isEmpty,
      s"${violations.size} decision value(s) at $dir sit inside the " +
        "environment-divergence band — the q154/q205 class; make the " +
        "decision path integer-exact (the r16 q205 convention) or move " +
        "the fixture off the boundary:\n  " +
        violations.distinct.mkString("\n  "))
    assert(sitesSeen > 0, "sweep found no decision sites — the detector " +
      "regressed (the registry has ~16 queries with RND0/CMP shapes)")
  }

  test("no decision variable sits inside the divergence band at sf0.001") {
    sweepAt(sfDir)
  }

  test("no decision variable sits inside the divergence band at sf0.01") {
    sweepAt("/root/testdata/sf0.01")
  }

  // ---------------------------------------------------------------
  // class proof: RED on the r15 form, zero sites on the r16 form
  // ---------------------------------------------------------------

  test("detector flags the r15 q205 double-riding λ-validity form") {
    import spark.implicits._
    // Reconstruction of ops/Sampling.scala@r15:303-310 with the
    // judge-measured geometry: candidate λ = (B−prefCap)/(totW−prefW)
    // rides doubles and clears its bound `cand < r` by ~3e-8 at
    // operand scale ~1 — relative 3e-8, far inside the 1e-6 band.
    val df = Seq(
      // (budgetLeft, weightLeft, prevR, r)  → cand = bl/wl
      (1.0000000300000001e6, 1.0e6, 0.5, 1.00000006),
      (2.0e6, 1.0e6, 1.00000006, 5.0)
    ).toDF("bl", "wl", "prevR", "r")
    val plan = df
      .selectExpr("bl / wl AS cand", "prevR + 0.0 AS prevR", "r + 0.0 AS r")
      .filter("cand >= prevR AND cand < r")
      .queryExecution.analyzed
    val aliases = aliasMap(plan)
    val found = scala.collection.mutable.ArrayBuffer.empty[(LogicalPlan, Site)]
    plan.foreach { node =>
      sitesAt(node, aliases).foreach(s => found += ((node, s)))
    }
    assert(found.nonEmpty, "detector missed the double-riding comparison")
    val viols = found.groupBy(_._1).toSeq.flatMap { case (node, pairs) =>
      probe("r15_q205_form", node, pairs.map(_._2).distinct.toSeq, aliases).flatMap {
        case scala.util.Right(m) => judge(m)
        case scala.util.Left(r) => Seq(s"unmeasurable: $r")
      }
    }
    assert(viols.nonEmpty,
      "the r15 λ-validity geometry must be flagged by the sweep band")
    assert(viols.exists(_.contains("cand")), viols.mkString("; "))
  }

  test("integer-exact q205 exposes zero double decision sites") {
    val plan = SparkEntry.queries("q205_epoch_allocation")(spark, sfDir)
      .queryExecution.analyzed
    val aliases = aliasMap(plan)
    val found = scala.collection.mutable.ArrayBuffer.empty[String]
    plan.foreach { node =>
      sitesAt(node, aliases).foreach(s => found += s.key)
    }
    assert(found.isEmpty,
      "q205's decision path must stay integer-exact (r16 convention); " +
        "found: " + found.mkString("; "))
  }
}
