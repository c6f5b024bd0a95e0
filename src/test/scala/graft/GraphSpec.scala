package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    Graph.pageRank(edges.toDF("s", "t"), col("s"), col("t"), iters)
      .as[(Long, Double)].collect().toMap

  test("pageRank: symmetric cycle stays uniform through any number of rounds") {
    // a->b->c->a: every node has in=out=1, so rank 1/3 is a fixpoint
    val r = ranks(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L), 4)
    assert(r.keySet === Set(1L, 2L, 3L))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9, s"$r"))
  }

  test("pageRank: star hub accumulates, leaves get the teleport floor (hand-computed)") {
    // a->c, b->c; one round from uniform 1/3:
    //   leaves: 0.15/3 = 0.05
    //   hub:    0.15/3 + 0.85*(1/3 + 1/3) = 0.616666667 (round 9)
    val r = ranks(Seq(1L -> 3L, 2L -> 3L), 1)
    assert(math.abs(r(1L) - 0.05) < 1e-9)
    assert(math.abs(r(2L) - 0.05) < 1e-9)
    assert(math.abs(r(3L) - 0.616666667) < 1e-9, s"$r")
    // second round: hub's rank goes nowhere (dangling, not
    // redistributed — documented), leaves keep only the floor
    val r2 = ranks(Seq(1L -> 3L, 2L -> 3L), 2)
    assert(math.abs(r2(3L) - (0.05 + 0.85 * (0.05 + 0.05))) < 1e-9)
    assert(r2(3L) > r2(1L), "link authority must rank the hub first")
  }

  private def ranksD(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    Graph.pageRank(edges.toDF("s", "t"), col("s"), col("t"), iters,
        redistributeDangling = true)
      .as[(Long, Double)].collect().toMap

  test("pageRank dangling redistribution: hand-computed sink round; mass conserved") {
    // 1->2, 1->3, 2->3; node 3 is a sink. One round from uniform 1/3
    // (r0 quantized to 0.333333333):
    //   D = 0.333333333 (node 3), teleport floor (1-0.85)/3 = 0.05
    //   r(1) = 0.05 + 0.85*(0 + D/3)                       = 0.144444444
    //   r(2) = 0.05 + 0.85*(r0(1)/2 + D/3)                 = 0.286111111
    //   r(3) = 0.05 + 0.85*(r0(1)/2 + r0(2) + D/3)         = 0.569444444
    val r = ranksD(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L), 1)
    assert(math.abs(r(1L) - 0.144444444) < 1e-9, s"$r")
    assert(math.abs(r(2L) - 0.286111111) < 1e-9, s"$r")
    assert(math.abs(r(3L) - 0.569444444) < 1e-9, s"$r")
    // conservation: with redistribution the ranks sum to 1 up to
    // per-node quantization; without, the sink leaks its mass
    for (it <- 1 to 3) {
      val sumD = ranksD(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L), it).values.sum
      assert(math.abs(sumD - 1.0) < 1e-7, s"iters=$it mass not conserved: $sumD")
    }
    val leaky = ranks(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L), 3).values.sum
    assert(leaky < 0.95, s"leaky convention should lose sink mass, summed $leaky")
    // a sink-free graph is unaffected by the flag (D = 0 every round)
    val cycle = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    assert(ranksD(cycle, 3) === ranks(cycle, 3))
  }

  test("pageRank: iters = 0 returns the uniform initialization") {
    val r = ranks(Seq(1L -> 2L), 0)
    assert(r === Map(1L -> 0.5, 2L -> 0.5))
  }

  test("pageRank: edges with a null endpoint are dropped, not joined as a node") {
    val edges = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(3L)),
      (java.lang.Long.valueOf(4L), null.asInstanceOf[java.lang.Long]))
      .toDF("s", "t")
    val r = Graph.pageRank(edges, col("s"), col("t"), 1)
      .as[(Long, Double)].collect().toMap
    assert(r.keySet === Set(1L, 2L))
  }

  private def tris(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("s", "t"), col("s"), col("t"))
      .as[(Long, Long)].collect().toMap

  test("triangleCounts: K4 has 4 triangles, 3 per node") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val r = tris(k4)
    assert(r === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: triangle-free graph (star + path) returns no rows") {
    assert(tris(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 4L -> 5L)) === Map.empty)
  }

  test("triangleCounts: direction, duplicates and self-loops don't change counts") {
    // one triangle {1,2,3}: each edge given twice in mixed directions,
    // plus a self-loop and a dangling edge
    val r = tris(Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 3L -> 1L,
      1L -> 3L, 2L -> 2L, 3L -> 4L))
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: hub-skew graph matches the naive per-node count (degree orientation preserves semantics)") {
    // hub 0 joined to 20 spokes; consecutive spokes joined — 19
    // hub-spoke-spoke triangles; hub is in all 19, spoke i in
    // |{i-1,i+1} ∩ spokes| of them
    val spokes = (1L to 20L)
    val edges = spokes.map(s => (0L, s)) ++ spokes.init.map(s => (s, s + 1))
    val r = tris(edges)
    assert(r(0L) === 19L)
    assert(r(1L) === 1L && r(20L) === 1L)
    (2L to 19L).foreach(s => assert(r(s) === 2L, s"spoke $s"))
  }
}
