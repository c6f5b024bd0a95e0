package graft

import org.apache.spark.sql.functions._
import graft.functions.FreqItems

/** Misra-Gries frequent items (⊕ A6 sketch family): exact mode when
  * distinct ≤ capacity, the undercount + containment guarantees under
  * overflow (any partitioning), and null handling.
  */
class FreqItemsSpec extends SparkSuite {
  import spark.implicits._

  private def summarize(data: Seq[String], capacity: Int, parts: Int): Map[String, Long] =
    data.toDF("k").repartition(parts)
      .agg(FreqItems.freqItems(capacity)(col("k")).as("fi"))
      .select(explode(col("fi")).as("x"))
      .select(col("x.item"), col("x.est"))
      .as[(String, Long)].collect().toMap

  test("exact when distinct keys fit the capacity, any partitioning") {
    val data = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c") ++ Seq("d")
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 3, 7)) {
      assert(summarize(scala.util.Random.shuffle(data), capacity = 4, parts) == truth)
    }
  }

  test("overflow: undercount + containment bounds hold under any partitioning") {
    // skewed stream: two heavy keys over a long uniform tail
    val heavy = Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2")
    val tail = (0 until 500).map(i => s"cold$i")
    val data = scala.util.Random.shuffle(heavy ++ tail)
    val n = data.size
    val cap = 8
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 9)) {
      val got = summarize(data, cap, parts)
      assert(got.size <= cap)
      // every estimate undercounts by at most n/(cap+1)
      got.foreach { case (k, est) =>
        assert(est <= truth(k), s"$k overcounted: $est > ${truth(k)}")
        assert(est >= truth(k) - n / (cap + 1),
          s"$k undercounted beyond bound: $est < ${truth(k)} - ${n / (cap + 1)}")
      }
      // any key with freq > n/(cap+1) must be present
      truth.collect { case (k, c) if c > n / (cap + 1) => k }
        .foreach(k => assert(got.contains(k), s"heavy key $k missing"))
    }
  }

  test("nulls don't aggregate; empty input yields an empty summary") {
    val withNulls = Seq(Some("x"), None, Some("x"), None).toDF("k")
      .agg(FreqItems.freqItems(4)(col("k")).as("fi"))
      .select(size(col("fi")).as("n"), element_at(col("fi"), 1).getField("est").as("est"))
      .as[(Int, Long)].head()
    assert(withNulls == ((1, 2L)))
    val empty = Seq.empty[String].toDF("k")
      .agg(FreqItems.freqItems(4)(col("k")).as("fi"))
      .select(size(col("fi"))).as[Int].head()
    assert(empty == 0)
  }

  test("capacity guard") {
    intercept[IllegalArgumentException](FreqItems.Agg(0))
  }
}
