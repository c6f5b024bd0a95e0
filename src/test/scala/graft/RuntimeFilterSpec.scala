package graft

import org.apache.spark.sql.functions._
import graft.ops.RuntimeFilter

/** Bloom runtime-filter pruning (⊕): superset semantics (no false
  * negatives), composed-join equality with the unpruned join, actual
  * pruning power on a selective dim, and null-key behavior.
  */
class RuntimeFilterSpec extends SparkSuite {
  import spark.implicits._

  private lazy val fact = (1L to 1000L).map(i => (i, i % 97)).toDF("fk", "payload")
  private lazy val dim = Seq(5L, 42L, 777L).toDF("dk")

  test("probe is a superset of the true matches (no false negatives)") {
    val pruned = RuntimeFilter.bloomPrune(fact, col("fk"), dim, col("dk"),
      expectedItems = 100L, numBits = 8000L)
    val prunedKeys = pruned.select("fk").as[Long].collect().toSet
    assert(Set(5L, 42L, 777L).subsetOf(prunedKeys))
  }

  test("bloom prune + exact join == plain join, and pruning actually prunes") {
    val pruned = RuntimeFilter.bloomPrune(fact, col("fk"), dim, col("dk"),
      expectedItems = 100L, numBits = 8000L)
    val composed = pruned.join(dim, pruned("fk") === dim("dk"))
      .select("fk", "payload").as[(Long, Long)].collect().toSet
    val plain = fact.join(dim, fact("fk") === dim("dk"))
      .select("fk", "payload").as[(Long, Long)].collect().toSet
    assert(composed == plain)
    // a well-sized filter (≈0.03 fp at 80 bits/item here) must remove
    // nearly all of the 997 non-matching keys
    val n = pruned.count()
    assert(n < 100, s"bloom pruned to $n rows — filter not selective")
  }

  test("null fact keys are dropped by the probe (they cannot equi-join)") {
    val withNull = Seq(Option(5L), None, Option(999L)).toDF("fk")
    val pruned = RuntimeFilter.probe(withNull, col("fk"),
      RuntimeFilter.bloomOf(dim, col("dk"), 100L, 8000L))
    val keys = pruned.as[Option[Long]].collect().toSet
    assert(keys.contains(Some(5L)) && !keys.contains(None))
  }

  test("probe plans as a scan-side filter, no added exchange") {
    // parquet-backed input: a LocalRelation would be constant-folded
    // and hide the filter
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val bf = RuntimeFilter.bloomOf(dim, col("dk"), 100L, 8000L)
    val plan = RuntimeFilter.probe(li, col("l_partkey"), bf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe must not shuffle:\n$plan")
    assert(plan.contains("might_contain"), s"probe predicate missing:\n$plan")
  }
}
