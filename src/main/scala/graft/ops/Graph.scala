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
    * rounds: `r' = (1−d)/N + d·(Σ r_in/outdeg(in) + D/N)` where `D`
    * is the dangling-node mass when `redistributeDangling` is on.
    * With it off (the default — kept for the q109/q116 oracle
    * contract), dangling mass simply leaks, so ranks need not sum
    * to 1; that is fine on fixture-like graphs but the wrong
    * constant at web scale, where ~20% of pages are sinks — turn
    * redistribution ON for real crawls (q187 is the oracled form).
    * Multi-edges count once per occurrence; pass a `distinct()`
    * edge list for simple-graph semantics.
    *
    * Redistribution arithmetic (engine-exact): per-round ranks are
    * already quantized to `quantizeTo` decimals, so the dangling sum
    * is computed in exact integer nano-units —
    * `Σ CAST(round(r·1e9) AS BIGINT)` — an order-free integer
    * aggregation (the q137 convention), re-entering the update as
    * `dmu/1e9/N` with the identical operation order in the SQL
    * oracle. Cost: one extra 1-row aggregation per round over the
    * (pre-flagged) dangling subset — the single-row broadcast
    * normalizer stance.
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
               damping: Double = 0.85, quantizeTo: Int = 9,
               redistributeDangling: Boolean = false): DataFrame = {
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
    // static sink set, flagged once: nodes with no out-edges
    val dangling = if (!redistributeDangling) null
      else nodes.join(e.select(col("src").as("n")).distinct(), Seq("n"), "left_anti")
        .persist()
    var ranks = nodes
      .select(col("n"), round(lit(1.0 / n), quantizeTo).as("r"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val contribs = eDeg.join(ranks, eDeg("src") === ranks("n"))
        .select(col("dst").as("n"), (col("r") / col("deg")).as("c"))
        .groupBy("n").agg(sum(col("c")).as("c"))
      ranks =
        if (!redistributeDangling)
          nodes.join(contribs, Seq("n"), "left")
            .select(col("n"),
              round(lit((1 - damping) / n) +
                lit(damping) * coalesce(col("c"), lit(0.0)), quantizeTo).as("r"))
            .localCheckpoint()
        else {
          // dangling mass in exact integer nano-units — order-free
          val dm = ranks.join(dangling, Seq("n"), "left_semi")
            .agg(coalesce(sum(round(col("r") * 1e9, 0).cast("long")), lit(0L))
              .as("__dmu"))
          nodes.join(contribs, Seq("n"), "left")
            .crossJoin(broadcast(dm))
            .select(col("n"),
              round(lit((1 - damping) / n) +
                lit(damping) * (coalesce(col("c"), lit(0.0)) +
                  col("__dmu").cast("double") / 1e9 / n), quantizeTo).as("r"))
            .localCheckpoint()
        }
    }
    nodes.unpersist(); eDeg.unpersist()
    if (dangling != null) dangling.unpersist()
    ranks
  }

  /** ⊕ Per-node triangle counts over an undirected simple graph —
    * the local clustering signal (a node in many triangles sits in a
    * dense community; on a near-dup pair graph, triangles separate
    * genuine duplicate families from chance band collisions).
    *
    * Degree-ordered orientation (Cohen 2009, "Graph twiddling in a
    * MapReduce world"; also the arXiv:1101.5211 'forward' analysis):
    * each undirected edge is directed from its lower-(degree, id)
    * endpoint to the higher, making every triangle a single wedge
    * u→v, u→w closed by v→w — found exactly once. The wedge join
    * fans out from the LOW-degree side only, so a celebrity node
    * with degree d contributes d wedges as a target but never d² as
    * a hub — the standard bound: wedge count ≤ m^{3/2} regardless of
    * skew, where the naive per-node join is Σ deg² and a single hub
    * breaks it.
    *
    * Shape: symmetrize + distinct (one shuffle), degree aggregation
    * (same key), one self-join on the hub key for wedges, one
    * equi-join against the oriented edges to close them, then an
    * explode to the three corners and a count per node. Every join
    * is an equi-join on node keys; nothing crosses to the driver.
    * Returns `(node, n_triangles)` for nodes in ≥ 1 triangle.
    */
  def triangleCounts(edges: DataFrame, srcCol: Column, dstCol: Column): DataFrame = {
    val und = edges
      .select(least(srcCol, dstCol).as("a"), greatest(srcCol, dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // orient a→b iff (deg(a), a) < (deg(b), b) — a TOTAL order, so
    // exactly one direction survives per edge
    val annotated = und
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("deg", "db"), "b")
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = annotated.select(
      when(aFirst, struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"), col("da").as("dv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
    // wedges u→x, u→y canonicalized BY THE SAME (deg, id) ORDER the
    // orientation used (each arm carries its endpoint's degree), so
    // the closing edge v→w — oriented low-ord → high-ord — is stored
    // in exactly the direction the join probes; a triangle {a,b,c}
    // with ord a < b < c is found once, at hub a
    val l = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val r = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = l.join(r, Seq("u"))
      .filter(col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("u"), col("x").as("v"), col("y").as("w"))
    val closed = wedges.join(oriented.select(col("u").as("v"), col("v").as("w")),
      Seq("v", "w"))
    closed
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
