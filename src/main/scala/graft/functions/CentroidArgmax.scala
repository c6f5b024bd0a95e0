package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Exact argmax-dot cluster assignment against a fixed centroid
  * matrix as ONE codegen'd Catalyst expression (SURVEY.md §4
  * preference (b)) — the scale fix for the literal-centroid argmax's
  * O(k·d) plan size. The flat form
  * ([[graft.ext.Similarity.assignCluster]]) builds k separate
  * `dot(nv, array(lit...))` trees — 64 literal nodes each, so k=5000
  * centroids would put ~320k nodes into one projection, past what
  * codegen tolerates (the round-12 documented residual). Here the
  * matrix rides ONE reference object; plan size is O(1) in k.
  *
  * The argmax itself is exact best-first branch-and-bound over a
  * two-level index (the standard 2-level-IVF move, done exactly):
  * centroids are grouped into ~√k super-clusters by a deterministic
  * driver-side k-means (model-sized work); per row, each group's
  * upper bound `ub_g = dot(x, s_g) + r_g·‖x‖ + ε·(1+|dot|+r_g·‖x‖)`
  * (Cauchy-Schwarz plus MAGNITUDE-RELATIVE fp slack, ε=1e-9 — an
  * absolute slack would only dominate the fold's rounding error for
  * ≈unit-norm inputs) prunes groups that
  * cannot contain the winner. The slack makes pruning CONSERVATIVE
  * only, so the result is bit-identical to the flat argmax at any k:
  * the member dot is the same ascending sequential fold as
  * [[DotProduct.compute]], and ties keep the LOWEST centroid index —
  * `array_position(sims, array_max(sims))` semantics under
  * `java.lang.Double.compare`. CentroidArgmaxSpec proves bitwise
  * agreement with the flat form; q188 oracles it against the flat
  * SQL assignment.
  */
object CentroidArgmax {

  private[functions] def checkVec(t: DataType): TypeCheckResult = t match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_argmax needs array<double>, got $other")
  }

  def centroid_argmax(nv: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(CentroidArgmaxExpr(ColumnBridge.expression(nv),
      new CentroidIndex(centroids)))

  /** Top-`p` centroid indices by (sim DESC, idx ASC) — the probe
    * selection of [[graft.ext.Similarity.ivfSearchCore]] without its
    * O(k·d) literal ranking array. Same exact-pruning machinery as
    * [[centroid_argmax]] generalized to a p-deep result; bit-equal to
    * `slice(array_sort(struct(-sim, idx)), 1, p)`.
    */
  def centroid_topk(nv: Column, centroids: Array[Array[Double]], p: Int): Column =
    ColumnBridge.column(CentroidTopKExpr(ColumnBridge.expression(nv),
      new CentroidIndex(centroids), p))
}

/** Driver-built two-level index over the centroid matrix: member
  * groups from a deterministic local k-means (init = evenly spaced
  * centroid indices, 8 squared-L2 Lloyd rounds, empty groups
  * dropped), each with its mean `s_g` and cover radius
  * `r_g = max ‖c − s_g‖`. Grouping quality affects only pruning
  * efficiency, never correctness — the bound holds for ANY partition
  * of the centroids.
  */
final class CentroidIndex(val centroids: Array[Array[Double]]) extends Serializable {
  require(centroids.nonEmpty, "centroid_argmax needs at least one centroid")
  val dim: Int = centroids(0).length
  require(centroids.forall(_.length == dim),
    "centroid_argmax: ragged centroid matrix")

  // content-based equality — expression reference objects must equal
  // by content or Catalyst CSE/cache plan-matching silently fails
  // (the q46/r14 lesson; see LexiconIndex). The derived group index
  // is a pure function of `centroids`, so comparing centroids alone
  // is exact.
  override def equals(o: Any): Boolean = o match {
    case that: CentroidIndex =>
      java.util.Arrays.deepEquals(
        centroids.asInstanceOf[Array[AnyRef]], that.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])

  // Pruning slack is RELATIVE to the bound's own magnitude (review
  // round-14): an absolute 1e-9 only dominates the fp error of the
  // dot/bound folds for bounded (≈unit-norm) inputs — at large
  // magnitudes the rounding error of `x·s_g + r_g·‖x‖` itself can
  // exceed an absolute slack and prune the true winner. The factor
  // 1 + |dot| + r·‖x‖ upper-bounds every intermediate's magnitude, so
  // eps·(that) dominates the fold's rounding error at ANY input
  // scale; the slack only ever LOOSENS the bound, so exactness
  // (bit-identical to the flat argmax) is preserved, a pruning never
  // removes the winner, and efficiency at unit-norm inputs is
  // unchanged (slack stays ~1e-9 there).
  private val eps = 1e-9

  @inline private def slack(dot: Double, rnrm: Double): Double =
    eps * (1.0 + math.abs(dot) + rnrm)

  // groupMembers(g) = ascending original centroid indices; superCents
  // and radii align with it
  val (groupMembers: Array[Array[Int]],
       superCents: Array[Array[Double]],
       radii: Array[Double]) = {
    val k = centroids.length
    val s = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    var seeds = Array.tabulate(s)(i => centroids((i.toLong * k / s).toInt))
    var assign = new Array[Int](k)
    var it = 0
    while (it < 8) {
      var i = 0
      while (i < k) {
        var best = 0; var bestD = Double.MaxValue
        var g = 0
        while (g < seeds.length) {
          var d2 = 0.0; var j = 0
          while (j < dim) {
            val df = centroids(i)(j) - seeds(g)(j); d2 += df * df; j += 1
          }
          if (d2 < bestD) { bestD = d2; best = g }
          g += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(seeds.length)(new Array[Double](dim))
      val cnts = new Array[Int](seeds.length)
      i = 0
      while (i < k) {
        val g = assign(i); cnts(g) += 1
        var j = 0
        while (j < dim) { sums(g)(j) += centroids(i)(j); j += 1 }
        i += 1
      }
      seeds = seeds.indices.map { g =>
        if (cnts(g) == 0) seeds(g)
        else sums(g).map(_ / cnts(g))
      }.toArray
      it += 1
    }
    val byGroup = (0 until k).groupBy(assign).toArray
      .sortBy(_._1).map(_._2.sorted.toArray)
    val cents = byGroup.map { ms =>
      val m = new Array[Double](dim)
      ms.foreach { i =>
        var j = 0
        while (j < dim) { m(j) += centroids(i)(j); j += 1 }
      }
      m.map(_ / ms.length)
    }
    val rs = byGroup.indices.map { g =>
      byGroup(g).map { i =>
        var d2 = 0.0; var j = 0
        while (j < dim) {
          val df = centroids(i)(j) - cents(g)(j); d2 += df * df; j += 1
        }
        math.sqrt(d2)
      }.max
    }.toArray
    (byGroup, cents, rs)
  }

  /** Exact flat-argmax result via bounded group scan. Static-shaped
    * for codegen (called from generated code via the reference obj).
    */
  def argmax(nv: ArrayData): Int = {
    val n = nv.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"centroid_argmax dimension mismatch: vector dim $n vs centroid dim $dim")
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (nv.isNullAt(i)) throw new IllegalArgumentException(
        s"centroid_argmax: null vector component at $i")
      x(i) = nv.getDouble(i); i += 1
    }
    var nrm2 = 0.0
    i = 0
    while (i < n) { nrm2 += x(i) * x(i); i += 1 }
    val nrm = math.sqrt(nrm2)
    val s = superCents.length
    val ubs = new Array[Double](s)
    val order = new Array[Int](s)
    var g = 0
    while (g < s) {
      val sc = superCents(g)
      var d = 0.0; var j = 0
      while (j < dim) { d += x(j) * sc(j); j += 1 }
      val rn = radii(g) * nrm
      ubs(g) = d + rn + slack(d, rn)
      order(g) = g
      g += 1
    }
    // insertion sort desc by ub — s ~ √k, tiny
    var a = 1
    while (a < s) {
      val o = order(a); val v = ubs(o)
      var b = a - 1
      while (b >= 0 && ubs(order(b)) < v) { order(b + 1) = order(b); b -= 1 }
      order(b + 1) = o
      a += 1
    }
    var bestSim = Double.NegativeInfinity
    var bestIdx = 0
    var scanned = false
    var gi = 0
    while (gi < s) {
      val grp = order(gi)
      // sorted desc: once a bound falls strictly below the best sim,
      // no later group can hold the winner (or a lower-index tie)
      if (scanned && java.lang.Double.compare(ubs(grp), bestSim) < 0) gi = s
      else {
        val ms = groupMembers(grp)
        var mi = 0
        while (mi < ms.length) {
          val idx = ms(mi)
          val c = centroids(idx)
          var d = 0.0; var j = 0
          while (j < dim) { d += x(j) * c(j); j += 1 }
          val cmp = java.lang.Double.compare(d, bestSim)
          if (!scanned || cmp > 0 || (cmp == 0 && idx < bestIdx)) {
            bestSim = d; bestIdx = idx; scanned = true
          }
          mi += 1
        }
        gi += 1
      }
    }
    bestIdx
  }

  /** Exact top-`p` (sim DESC, idx ASC) via the same bounded group
    * scan: a group is skipped only when its upper bound falls
    * STRICTLY below the current p-th-best sim with the list full —
    * boundary ties must still scan (a tied sim at a lower index
    * belongs in the list). Result order is the flat
    * `array_sort(struct(-sim, idx))` order.
    */
  def topk(nv: ArrayData, p: Int): ArrayData = {
    val n = nv.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"centroid_topk dimension mismatch: vector dim $n vs centroid dim $dim")
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (nv.isNullAt(i)) throw new IllegalArgumentException(
        s"centroid_topk: null vector component at $i")
      x(i) = nv.getDouble(i); i += 1
    }
    var nrm2 = 0.0
    i = 0
    while (i < n) { nrm2 += x(i) * x(i); i += 1 }
    val nrm = math.sqrt(nrm2)
    val s = superCents.length
    val ubs = new Array[Double](s)
    val order = new Array[Int](s)
    var g = 0
    while (g < s) {
      val sc = superCents(g)
      var d = 0.0; var j = 0
      while (j < dim) { d += x(j) * sc(j); j += 1 }
      val rn = radii(g) * nrm
      ubs(g) = d + rn + slack(d, rn)
      order(g) = g
      g += 1
    }
    var a = 1
    while (a < s) {
      val o = order(a); val v = ubs(o)
      var b = a - 1
      while (b >= 0 && ubs(order(b)) < v) { order(b + 1) = order(b); b -= 1 }
      order(b + 1) = o
      a += 1
    }
    val cap = math.min(p, centroids.length)
    val topSim = new Array[Double](cap)
    val topIdx = new Array[Int](cap)
    var filled = 0
    // (sim, idx) ranks before (s2, i2) in the flat order?
    def before(sim: Double, idx: Int, s2: Double, i2: Int): Boolean = {
      val c = java.lang.Double.compare(sim, s2)
      c > 0 || (c == 0 && idx < i2)
    }
    var gi = 0
    while (gi < s) {
      val grp = order(gi)
      if (filled == cap &&
          java.lang.Double.compare(ubs(grp), topSim(cap - 1)) < 0) gi = s
      else {
        val ms = groupMembers(grp)
        var mi = 0
        while (mi < ms.length) {
          val idx = ms(mi)
          val c = centroids(idx)
          var d = 0.0; var j = 0
          while (j < dim) { d += x(j) * c(j); j += 1 }
          if (filled < cap || before(d, idx, topSim(cap - 1), topIdx(cap - 1))) {
            // insertion into the sorted top list
            var pos = if (filled < cap) filled else cap - 1
            while (pos > 0 && before(d, idx, topSim(pos - 1), topIdx(pos - 1))) {
              topSim(pos) = topSim(pos - 1); topIdx(pos) = topIdx(pos - 1)
              pos -= 1
            }
            topSim(pos) = d; topIdx(pos) = idx
            if (filled < cap) filled += 1
          }
          mi += 1
        }
        gi += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(topIdx, filled))
  }
}

/** `vector → int` cluster id. */
case class CentroidArgmaxExpr(child: Expression, index: CentroidIndex)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    CentroidArgmax.checkVec(child.dataType)

  override protected def nullSafeEval(nv: Any): Any =
    index.argmax(nv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("centroidIndex", index,
      classOf[CentroidIndex].getName)
    defineCodeGen(ctx, ev, nv => s"$idxRef.argmax($nv)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidArgmaxExpr =
    copy(child = newChild)
}

/** `vector → array<int>` of the top-`p` centroid indices, flat probe
  * order (sim DESC, idx ASC).
  */
case class CentroidTopKExpr(child: Expression, index: CentroidIndex, p: Int)
    extends UnaryExpression {
  require(p > 0, s"centroid_topk needs p > 0, got $p")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    CentroidArgmax.checkVec(child.dataType)

  override protected def nullSafeEval(nv: Any): Any =
    index.topk(nv.asInstanceOf[ArrayData], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("centroidIndex", index,
      classOf[CentroidIndex].getName)
    defineCodeGen(ctx, ev, nv => s"$idxRef.topk($nv, $p)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidTopKExpr =
    copy(child = newChild)
}
