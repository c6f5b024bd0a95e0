package graft

import org.apache.spark.sql.functions._

/** Smoke + semantics checks for the core relational query batch.
  * Deep equivalence runs in the driver's DuckDB oracle; here we pin
  * row counts / invariants on sf0.001 and per-operator edge cases.
  */
class CoreQueriesSpec extends SparkSuite {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has oracle SQL or is intentionally rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query: ${o -- q}")
  }

  // The "all queries run and are deterministic" sweep lives in the
  // CoreQueriesDeterminismSpec0-3 shard suites below this file —
  // measured 6:40 as one monolithic test, which made it the wall-clock
  // bound of the whole grouped parallel suite; the shards partition
  // the sorted query list with identical total coverage.

  test("q06 top-k emits at most k rows per group") {
    val df = SparkEntry.queries("q06_topk_per_group")(spark, sfDir)
    val over = df.groupBy("o_orderpriority").count().filter(col("count") > 3)
    assert(over.isEmpty)
  }

  test("q04 semi-join keeps a subset of orders") {
    val total = sources.Tables.orders(spark, sfDir).count()
    val semi = SparkEntry.queries("q04_semi_join")(spark, sfDir)
      .agg(sum("n_orders")).head.getLong(0)
    assert(semi > 0 && semi <= total)
  }
}
