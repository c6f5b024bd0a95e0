package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph operators over edge lists.
  *
  * PageRank is the curation use case: rank the domain graph of a web
  * crawl (edges from [[graft.ext.UrlOps]] domains) so per-domain
  * quality gates can weight link authority — the Common-Crawl-style
  * provenance signal.
  */
object Graph {

  /** ⊕ Damped PageRank over an edge list, `iters` synchronous
    * rounds: `r' = (1−d)/N + d·Σ r_in/outdeg(in)`. Simplified
    * convention (documented): dangling-node mass is NOT
    * redistributed, so ranks need not sum to 1 — the relative
    * ordering (what a quality gate consumes) is unaffected.
    * Multi-edges count once per occurrence; pass a `distinct()`
    * edge list for simple-graph semantics.
    *
    * Every round rounds ranks to `quantizeTo` decimals — the
    * [[graft.ext.Similarity.ivfFit]] quantization trick: iteration
    * results are insensitive to 1e-9 jitter but double summation
    * order is engine-specific, so quantized rounds make the whole
    * iteration reproducible in ANSI SQL (q109's oracle unrolls it).
    *
    * Scale shape: per round ONE equi-join of the (cached) degree-
    * annotated edge list against the current ranks and ONE hash
    * aggregation on the destination — both shuffle on node keys,
    * never materializing anything wider than (node, rank).
    * `localCheckpoint` truncates lineage per round (the q48 lesson:
    * without it, round k replays rounds 0..k−1). Only the node COUNT
    * crosses to the driver. A hub node with huge in-degree is
    * absorbed by partial aggregation (sum is algebraic); a hub with
    * huge OUT-degree fans its rank out in the join — at 100 TB,
    * that's the standard skew-salting case ([[Skew.saltedJoin]]).
    */
  def pageRank(edges: DataFrame, srcCol: Column, dstCol: Column, iters: Int,
               damping: Double = 0.85, quantizeTo: Int = 9): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // a null endpoint has no stable node identity — dropped up front
    // (the weightedSample null-key convention), never silently joined
    val e = edges.select(srcCol.as("src"), dstCol.as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val nodes = e.select(col("src").as("n"))
      .union(e.select(col("dst").as("n"))).distinct().persist()
    val n = nodes.count() // the one driver-side scalar
    val eDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .persist()
    var ranks = nodes
      .select(col("n"), round(lit(1.0 / n), quantizeTo).as("r"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val contribs = eDeg.join(ranks, eDeg("src") === ranks("n"))
        .select(col("dst").as("n"), (col("r") / col("deg")).as("c"))
        .groupBy("n").agg(sum(col("c")).as("c"))
      ranks = nodes.join(contribs, Seq("n"), "left")
        .select(col("n"),
          round(lit((1 - damping) / n) +
            lit(damping) * coalesce(col("c"), lit(0.0)), quantizeTo).as("r"))
        .localCheckpoint()
    }
    nodes.unpersist(); eDeg.unpersist()
    ranks
  }
}
