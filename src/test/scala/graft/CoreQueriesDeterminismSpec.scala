package graft

/** The determinism sweep formerly inside CoreQueriesSpec ("all queries
  * run and are deterministic on sf0.001" — every declared query
  * evaluated twice and compared), SHARDED so the grouped parallel test
  * runner can spread it across JVMs: as one monolithic test it
  * measured 6:40 solo, which made it the wall-clock lower bound of the
  * whole suite regardless of group count. The shards partition the
  * SORTED query list by index mod `of`, so total coverage is identical
  * to the monolithic form (every query, same double-evaluation
  * assertion) and adding queries keeps shards balanced.
  */
abstract class CoreQueriesDeterminismShard(shard: Int, of: Int)
    extends SparkSuite {
  test(s"all queries run and are deterministic on sf0.001 (shard $shard/$of)") {
    SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex
      .filter(_._2 % of == shard)
      .foreach { case ((name, fn), _) =>
        val a = fn(spark, sfDir).collect()
        val b = fn(spark, sfDir).collect()
        assert(a.toSeq == b.toSeq, s"$name not deterministic")
      }
  }
}

class CoreQueriesDeterminismSpec0 extends CoreQueriesDeterminismShard(0, 4)
class CoreQueriesDeterminismSpec1 extends CoreQueriesDeterminismShard(1, 4)
class CoreQueriesDeterminismSpec2 extends CoreQueriesDeterminismShard(2, 4)
class CoreQueriesDeterminismSpec3 extends CoreQueriesDeterminismShard(3, 4)
