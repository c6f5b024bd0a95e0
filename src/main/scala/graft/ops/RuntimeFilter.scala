package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** ⊕ Explicit runtime-filter (bloom) join pruning — the "ship a small
  * filter to the big scan" move that makes selective fact⋈dim joins
  * viable at 100 TB: instead of shuffling every fact row to discover
  * at the join that most of them have no dim partner, a bloom filter
  * built from the dim side's keys is evaluated INSIDE the fact scan's
  * filter, so non-matching rows die before the exchange.
  *
  * Spark's own `InjectRuntimeFilter` rule does this automatically, but
  * only when its heuristics fire (creation-side thresholds, selective
  * filters, shuffle-join shape). This op is the deterministic library
  * form: the caller names the dim side and the filter ALWAYS applies —
  * the same contract as DuckDB's perfect-hash join filters or a
  * semi-join reduction in a distributed warehouse.
  *
  * Correctness: bloom membership admits false positives and never
  * false negatives, so [[bloomPrune]] returns a SUPERSET of the fact
  * rows with a dim partner; the downstream exact join removes the
  * false positives and the composed result is byte-identical to the
  * unpruned join (the oracle checks exactly that composition).
  *
  * Scale notes:
  *  - The dim aggregate produces ONE binary value (the serialized
  *    sketch, `numBits/8` bytes) via partial-per-partition bloom
  *    merge — a tree-reduce of fixed-size bitsets, no key shuffle.
  *  - Materializing that single value on the driver and re-embedding
  *    it as a literal is the same data movement as the broadcast
  *    exchange Spark's rule plans; it is NOT a `.collect()` of data
  *    rows.
  *  - `might_contain` is a codegen'd predicate over `xxhash64(key)`,
  *    so the probe stays inside the scan's WholeStageCodegen span and
  *    is pushable below everything except the scan itself.
  */
object RuntimeFilter {

  /** Serialized bloom filter (as `BinaryType` bytes) over
    * `xxhash64(key)` for every row of `dim`. `expectedItems`/`numBits`
    * size the sketch: false-positive rate ≈ 0.03 at the default
    * 8 bits per expected item.
    */
  def bloomOf(dim: DataFrame, dimKey: Column,
              expectedItems: Long = 1000000L,
              numBits: Long = 8L * 1000000L): Array[Byte] = {
    val child = ColumnBridge.expression(xxhash64(dimKey))
    val agg = new BloomFilterAggregate(child,
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    dim.select(ColumnBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** `fact` restricted to rows whose `factKey` MIGHT be present in the
    * serialized bloom filter `bf` (superset semantics — follow with the
    * exact join). Null keys are dropped: they can never equi-join.
    */
  def probe(fact: DataFrame, factKey: Column, bf: Array[Byte]): DataFrame =
    fact.filter(ColumnBridge.column(BloomFilterMightContain(
      Literal(bf, BinaryType),
      ColumnBridge.expression(xxhash64(factKey)))))

  /** One-shot convenience: build the dim-side bloom, probe the fact
    * side. Equivalent to `probe(fact, factKey, bloomOf(dim, dimKey))`.
    */
  def bloomPrune(fact: DataFrame, factKey: Column,
                 dim: DataFrame, dimKey: Column,
                 expectedItems: Long = 1000000L,
                 numBits: Long = 8L * 1000000L): DataFrame =
    probe(fact, factKey, bloomOf(dim, dimKey, expectedItems, numBits))
}
