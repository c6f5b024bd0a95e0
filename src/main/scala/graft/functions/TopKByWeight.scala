package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY.md §2.7's sanctioned custom-aggregate
  * surface): per-group top-k rows by weight with O(k) state.
  *
  * Contrast with the W2 window pattern ([[graft.ops.TopK]]): the
  * window form shuffles rows and rank-limits them (WindowGroupLimit
  * pushes the limit map-side but still sorts each group's partition);
  * this aggregator folds every partition down to ≤ k entries BEFORE
  * the shuffle and merges k-lists on the reduce side — state is k
  * entries per group per partition, independent of group size, which
  * is the right shape when k ≪ group size and the group count is
  * huge. Runs under ObjectHashAggregate (typed aggregators don't
  * participate in whole-stage codegen — the documented cost of
  * leaving built-ins, kept off the default path).
  *
  * Determinism: entries are totally ordered by (weight desc, id asc),
  * so the result is a pure function of the input multiset — oracle-
  * checkable against `row_number()` SQL (q47).
  */
object TopKByWeight {

  /** One candidate row: an id and its weight. */
  case class Entry(id: Long, w: Double)

  /** Buffer wrapper so the buffer encoder is a plain product. */
  case class Buf(items: Seq[Entry])

  private val better: Ordering[Entry] =
    Ordering.by((e: Entry) => (-e.w, e.id))

  case class Agg(k: Int) extends Aggregator[Entry, Buf, Seq[Entry]] {
    require(k > 0, "k must be positive")
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: Entry): Buf =
      // O(1) early reject once the buffer is full: items stay sorted
      // best-first, so a candidate no better than the current k-th
      // (the common case on large groups) never triggers a re-sort
      if (b.items.length >= k && better.lteq(b.items.last, a)) b
      else Buf((a +: b.items).sorted(better).take(k))
    override def merge(b1: Buf, b2: Buf): Buf =
      Buf((b1.items ++ b2.items).sorted(better).take(k))
    override def finish(b: Buf): Seq[Entry] = b.items
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Untyped-DataFrame entry point: `topK(3)(col("id"), col("w"))`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(Agg(k), Encoders.product[Entry])
}
