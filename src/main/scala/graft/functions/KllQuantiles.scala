package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** ⊕ KLL quantile sketch (Karnin-Lang-Liberty 2016, via the Apache
  * DataSketches library already on the Spark classpath — the same
  * provenance as the HLL audience sketches, `ops/Audience`) — the A6
  * sketch family's QUANTILE member, completing the set: HLL = distinct
  * counts, Misra-Gries = heavy hitters, count-min = frequencies,
  * KLL = quantiles. `approx_percentile` answers one query in one job;
  * a KLL sketch is a STORED, MERGEABLE summary: build per
  * day/partition/source, persist the bytes, union summaries across
  * any grouping, and read any quantile later without re-scanning the
  * corpus — the percentile-monitoring scale path (e.g. feeding
  * [[graft.ops.Drift.numericDrift]]-style bin edges at 100 TB).
  *
  * Implemented as `TypedImperativeAggregate`s — the canonical sketch
  * mechanism: the live sketch object rides the hash-aggregate map and
  * serializes ONLY at partial/shuffle boundaries.
  *
  * Determinism contract (the Misra-Gries q77 convention): KLL
  * compaction draws random offsets, so estimates are partitioning-
  * and run-dependent in general. While `n ≤ k` the sketch retains
  * every value exactly — no compaction fires anywhere in the
  * build/merge tree — and quantile reads are EXACT and deterministic;
  * that regime is what the SQL oracle hash-checks, with the
  * approximate regime asserted in-query against the published
  * normalized rank error (the q34/q49 bound-boolean pattern) and
  * property-tested.
  */
object KllQuantiles {

  /** Build a KLL(k) sketch over a double column → binary. */
  case class KllSketchAgg(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike {

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }

    override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
      b1.merge(b2); b1
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"kll_sketch_agg needs double, got $other")
    }
    override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
      copy(child = newChild)
  }

  /** Union pre-built KLL sketches (binary column) → binary — the
    * roll-up side: per-day sketches merge to per-month with no
    * corpus re-scan.
    */
  case class KllMergeAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike {

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null)
        buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }

    override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
      b1.merge(b2); b1
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"kll_merge_agg needs binary, got $other")
    }
    override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
      copy(child = newChild)
  }

  private[functions] trait UnaryLike { self: Expression =>
    def child: Expression
    override def children: Seq[Expression] = Seq(child)
    protected def withNewChildInternal(newChild: Expression): Expression
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      withNewChildInternal(newChildren.head)
  }

  /** Read quantiles from a sketch column: `(sketch, probs literal) →
    * array<double>` (inclusive rank rule — the DataSketches default).
    * Eval-only (no codegen): runs once per GROUP row, never on the
    * corpus path. Empty sketches → null.
    */
  case class KllQuantileExpr(child: Expression, probs: Seq[Double])
      extends UnaryExpression with CodegenFallback {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"quantile probs must be in [0,1], got $probs")

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"kll_quantiles needs binary, got $other")
    }

    override protected def nullSafeEval(bytes: Any): Any = {
      val sk = KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
      if (sk.isEmpty) null
      else new GenericArrayData(probs.map(p => sk.getQuantile(p)).toArray)
    }

    override def nullable: Boolean = true
    override protected def withNewChildInternal(newChild: Expression): KllQuantileExpr =
      copy(child = newChild)
  }

  /** Sketch row count readout (exact — KLL tracks n exactly). */
  case class KllNExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"kll_n needs binary, got $other")
    }
    override protected def nullSafeEval(bytes: Any): Any =
      KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]])).getN
    override protected def withNewChildInternal(newChild: Expression): KllNExpr =
      copy(child = newChild)
  }

  def kll_sketch_agg(x: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(x), k).toAggregateExpression())

  def kll_merge_agg(sk: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(sk), k).toAggregateExpression())

  def kll_quantiles(sk: Column, probs: Seq[Double]): Column =
    ColumnBridge.column(KllQuantileExpr(ColumnBridge.expression(sk), probs))

  def kll_n(sk: Column): Column =
    ColumnBridge.column(KllNExpr(ColumnBridge.expression(sk)))

  /** Published single-sided normalized rank error for this k (the
    * bound the q181 in-query assertions use).
    */
  def rankError(k: Int): Double =
    org.apache.datasketches.kll.KllSketch.getNormalizedRankError(k, false)
}
