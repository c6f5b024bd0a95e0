package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** ⊕ Misra-Gries frequent-items ("heavy hitters") sketch as a typed
  * `Aggregator` — the A6 sketch family's counterpart to HLL
  * (approx_count_distinct) and KLL (approx_percentile): bounded-state
  * top-frequency estimation over an unbounded key domain, the scan
  * you run on a 100 TB corpus to find dominant domains/boilerplate
  * strings without a full groupBy shuffle of every distinct key.
  *
  * State is ≤ `capacity` (key, count) pairs per partition; partials
  * merge by pointwise sum followed by the standard offset subtraction
  * (subtract the (capacity+1)-th largest count and drop non-positive
  * entries — Agarwal et al.'s mergeable-summaries construction). The
  * whole aggregation is one ObjectHashAggregate with a tree reduce of
  * fixed-size maps; no shuffle of the key domain ever happens.
  *
  * Guarantees (n = total non-null rows observed):
  *  - every estimate undercounts: `true − n/(capacity+1) ≤ est ≤ true`
  *  - any key with `true > n/(capacity+1)` is PRESENT in the summary
  *  - when the distinct-key count never exceeds `capacity`, no
  *    decrement ever fires anywhere in the reduce/merge tree, so the
  *    summary is EXACT and independent of partitioning — that mode is
  *    deterministic and is what the SQL oracle checks (q77); the
  *    approximation bounds are property-tested on skewed synthetic
  *    data where merge order may vary the (bounded) error.
  *
  * Output is sorted (est desc, item asc) — a total order, so
  * exact-mode results are hash-comparable.
  */
object FreqItems {

  /** One summary entry: an item and its (under-)estimated count. */
  case class Item(item: String, est: Long)

  /** Buffer wrapper so the buffer encoder is a plain product. */
  case class Buf(counts: Map[String, Long])

  case class Agg(capacity: Int) extends Aggregator[String, Buf, Seq[Item]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Buf = Buf(Map.empty)

    override def reduce(b: Buf, a: String): Buf =
      if (a == null) b // nulls don't aggregate, matching SQL count semantics
      else b.counts.get(a) match {
        case Some(c) => Buf(b.counts.updated(a, c + 1))
        case None if b.counts.size < capacity => Buf(b.counts.updated(a, 1L))
        case None =>
          // classic MG decrement-all; zeros fall out of the summary
          Buf(b.counts.collect { case (k, c) if c > 1 => k -> (c - 1) })
      }

    override def merge(b1: Buf, b2: Buf): Buf = {
      val sum = b2.counts.foldLeft(b1.counts) { case (m, (k, c)) =>
        m.updated(k, m.getOrElse(k, 0L) + c)
      }
      if (sum.size <= capacity) Buf(sum)
      else {
        // subtract the (capacity+1)-th largest count from everything
        val d = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
        Buf(sum.collect { case (k, c) if c - d > 0 => k -> (c - d) })
      }
    }

    override def finish(b: Buf): Seq[Item] =
      b.counts.toSeq.map { case (k, c) => Item(k, c) }
        .sortBy(i => (-i.est, i.item))

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Item]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Item]]()
  }

  /** Untyped-DataFrame entry point: `freqItems(16)(col("domain"))`. */
  def freqItems(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(Agg(capacity), Encoders.STRING)
}
