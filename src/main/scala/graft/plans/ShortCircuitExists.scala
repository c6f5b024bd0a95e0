package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `size(filter(arr, p)) > 0` → `exists(arr, p)` (and
  * the `=== 0` / `>= 1` variants to its negation/equivalent).
  *
  * This is the engine-level form of the reference's `break` on first
  * keyword/comment hit (`app.py:59,142`; SURVEY.md §4 "short-circuit
  * first match"): `filter` materializes the whole matched array per
  * row before measuring it, while `exists` stops at the first
  * satisfying element. On wide keyword lists over long documents the
  * difference is the average match position vs the full list length.
  *
  * Registered either via [[GraftExtensions]]
  * (`SparkSession.builder.withExtensions(new GraftExtensions)`) or
  * post-hoc on a live session with [[ShortCircuitExists.install]]
  * (`spark.experimental.extraOptimizations` — how Verify/Bench get it
  * without owning session construction).
  */
object ShortCircuitExists extends Rule[LogicalPlan] {

  private object IntZero {
    def unapply(e: Expression): Boolean = e match {
      case Literal(0, IntegerType) => true
      case _ => false
    }
  }

  private object IntOne {
    def unapply(e: Expression): Boolean = e match {
      case Literal(1, IntegerType) => true
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // size(filter(a, p)) > 0  /  size(...) >= 1  →  exists(a, p)
    case GreaterThan(Size(ArrayFilter(arg, f), _), IntZero()) => ArrayExists(arg, f)
    case GreaterThanOrEqual(Size(ArrayFilter(arg, f), _), IntOne()) => ArrayExists(arg, f)
    // 0 < size(filter(a, p))  /  1 <= size(...)
    case LessThan(IntZero(), Size(ArrayFilter(arg, f), _)) => ArrayExists(arg, f)
    case LessThanOrEqual(IntOne(), Size(ArrayFilter(arg, f), _)) => ArrayExists(arg, f)
    // size(filter(a, p)) === 0  →  NOT exists(a, p)
    case EqualTo(Size(ArrayFilter(arg, f), _), IntZero()) => Not(ArrayExists(arg, f))
    case EqualTo(IntZero(), Size(ArrayFilter(arg, f), _)) => Not(ArrayExists(arg, f))
  }

  /** Idempotently add this rule to a live session's experimental
    * optimizations.
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this)) spark.experimental.extraOptimizations = cur :+ this
  }
}

/** Session-extension registration (SURVEY §4 surface): the one custom
  * optimizer Rule plus the SQL-function bindings for every custom
  * codegen expression ([[graft.functions.GraftFunctions]] — shared
  * with the live-session `install` path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => ShortCircuitExists)
    graft.functions.GraftFunctions.all.foreach(e.injectFunction)
  }
}
