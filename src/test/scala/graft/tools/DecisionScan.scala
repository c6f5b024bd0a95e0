package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, IntegerType => IT}

/** Dev-only inventory probe for the decision-variable sweep design:
  * walks every registered query's analyzed plan and prints
  *  (a) BinaryComparison sites where BOTH sides are DoubleType and
  *      neither is literal-rooted, and
  *  (b) Round(x, 0) sites feeding an integral Cast,
  * resolving attribute references through the plan's alias map so
  * "derived" means derived-through-arithmetic, not just "is an
  * attribute". Used once to size the DecisionBandSweepSpec allowlist.
  */
object DecisionScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.ShortCircuitExists.install(spark)
    val dir = "/root/testdata/sf0.001"

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.analyzed
        // alias map across the whole plan
        val aliases = scala.collection.mutable.Map[ExprId, Expression]()
        plan.foreach { node =>
          node.expressions.foreach(_.foreach {
            case a: Alias => aliases(a.exprId) = a.child
            case _ => ()
          })
        }
        def resolve(e: Expression, depth: Int = 0): Expression = e match {
          case ar: AttributeReference if depth < 40 =>
            aliases.get(ar.exprId).map(resolve(_, depth + 1)).getOrElse(ar)
          case c: Cast if depth < 40 => resolve(c.child, depth + 1)
          case other => other
        }
        // is the (resolved) expression free of double arithmetic?
        def inert(e: Expression, depth: Int = 0): Boolean = resolve(e) match {
          case _: Literal => true
          case _: AttributeReference => true // un-aliased => source column
          case r @ Round(_, Literal(k: Int, IntegerType), _) if k >= 1 => true
          case _ if depth >= 20 => false
          case other =>
            // arithmetic / agg / window over doubles => derived
            val hasArith = other.exists {
              case _: Add | _: Subtract | _: Multiply | _: Divide |
                   _: Sqrt | _: Pow | _: Exp | _: Log | _: Logarithm |
                   _: UnaryMinus | _: Remainder => true
              case _: AggregateExpression | _: WindowExpression => true
              case _ => false
            }
            !hasArith
        }
        val cmp = scala.collection.mutable.ArrayBuffer[String]()
        val rnd0 = scala.collection.mutable.ArrayBuffer[String]()
        plan.foreach { node =>
          node.expressions.foreach(_.foreach {
            case bc: BinaryComparison
                if bc.left.dataType == DoubleType &&
                  bc.right.dataType == DoubleType &&
                  !inert(bc.left) && !inert(bc.right) =>
              cmp += bc.sql.take(160)
            case c: Cast if (c.dataType == LongType || c.dataType == IT) =>
              c.child match {
                case Round(x, Literal(0, IntegerType), _) if !inert(x) =>
                  rnd0 += c.sql.take(160)
                case _ => ()
              }
            case _ => ()
          })
        }
        if (cmp.nonEmpty || rnd0.nonEmpty) {
          println(s"== $name")
          cmp.distinct.foreach(s => println(s"  CMP  $s"))
          rnd0.distinct.foreach(s => println(s"  RND0 $s"))
        }
      } catch {
        case e: Throwable => println(s"== $name ERROR ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
