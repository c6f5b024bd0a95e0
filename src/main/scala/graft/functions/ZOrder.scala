package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleaving as plain Column arithmetic — the
  * classic shift-and-mask bit spread, built entirely from codegen'd
  * built-ins (`shiftleft`/`&`/`|`), so the key computation runs inside
  * whole-stage codegen with no custom expression and no UDF.
  *
  * Why an analytics engine wants this: parquet readers skip row
  * groups whose column min/max can't satisfy a predicate, but a sort
  * on ONE column only clusters THAT column — a filter on any other
  * column still reads every file. Sorting by the interleaved key
  * clusters BOTH dimensions at once (each file covers a small Z-curve
  * square), so either-column predicates prune — the data-layout lever
  * a 100 TB table has besides partitioning ([[graft.sinks.Layout]]
  * does the writing; LayoutSpec measures the pruning on real files).
  */
object ZOrder {

  /** Spread the low 32 bits of `c` to the even bit positions of a
    * long (bit i → bit 2i) — the standard doubling mask cascade.
    */
  def spreadBits(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x3333333333333333L))
    x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton-interleave two values (`a` on even bits, `b` on odd).
    * Callers keep inputs below 2³¹ so the result stays non-negative
    * and orders correctly as a signed long; the layout path feeds
    * 16-bit quantile ranks, far inside that.
    */
  def zorder2(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Reference implementation for the spec: bit-by-bit interleave. */
  private[graft] def mortonRef(a: Int, b: Int): Long =
    (0 until 32).foldLeft(0L) { (acc, i) =>
      acc | ((a.toLong >> i) & 1L) << (2 * i) |
        ((b.toLong >> i) & 1L) << (2 * i + 1)
    }
}
