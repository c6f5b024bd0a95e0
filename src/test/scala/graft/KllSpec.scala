package graft

import org.apache.spark.sql.functions._

import graft.functions.KllQuantiles._

/** [[graft.functions.KllQuantiles]] — the A6 quantile sketch. */
class KllSpec extends SparkSuite {
  import spark.implicits._

  test("exact regime (n <= k): quantiles equal the inclusive-rank exact values, any partitioning") {
    val vals = (1 to 150).map(_.toDouble * 3)
    for (parts <- Seq(1, 4, 9)) {
      val df = vals.toDF("x").repartition(parts)
      val got = df.agg(kll_sketch_agg(col("x")).as("sk"))
        .select(kll_n(col("sk")).as("n"),
          kll_quantiles(col("sk"), Seq(0.1, 0.5, 0.9, 1.0)).as("q"))
        .as[(Long, Seq[Double])].head()
      assert(got._1 == 150L)
      // DataSketches inclusive rule: smallest value with rank >= p
      def exact(p: Double): Double = {
        val sorted = vals.sorted
        sorted(math.max(0, math.ceil(p * vals.size).toInt - 1))
      }
      assert(got._2 == Seq(exact(0.1), exact(0.5), exact(0.9), exact(1.0)),
        s"parts=$parts got ${got._2}")
    }
  }

  test("merge-of-parts ≡ build-over-whole in the exact regime; n conserved always") {
    val a = (1 to 60).map(_.toDouble).toDF("x").withColumn("g", lit("a"))
    val b = (200 to 280).map(_.toDouble).toDF("x").withColumn("g", lit("b"))
    val whole = a.unionByName(b)
    val direct = whole.agg(kll_sketch_agg(col("x")).as("sk"))
      .select(kll_quantiles(col("sk"), Seq(0.25, 0.5, 0.75)).as("q"),
        kll_n(col("sk")).as("n"))
      .as[(Seq[Double], Long)].head()
    val merged = whole.groupBy(col("g")).agg(kll_sketch_agg(col("x")).as("psk"))
      .agg(kll_merge_agg(col("psk")).as("msk"))
      .select(kll_quantiles(col("msk"), Seq(0.25, 0.5, 0.75)).as("q"),
        kll_n(col("msk")).as("n"))
      .as[(Seq[Double], Long)].head()
    assert(direct == merged, s"$direct vs $merged")
    // approximate regime: exact values may drift, n never does
    val big = (1 to 100000).map(i => (i % 7).toString -> i.toDouble)
      .toDF("g", "x")
    val nDirect = big.agg(kll_sketch_agg(col("x")).as("sk"))
      .select(kll_n(col("sk"))).as[Long].head()
    val nMerged = big.groupBy("g").agg(kll_sketch_agg(col("x")).as("psk"))
      .agg(kll_merge_agg(col("psk")).as("msk"))
      .select(kll_n(col("msk"))).as[Long].head()
    assert(nDirect == 100000L && nMerged == 100000L)
  }

  test("approximate regime: estimates stay within 3x the published rank error") {
    val n = 50000
    val vals = (1 to n).map(_.toDouble)
    val df = vals.toDF("x").repartition(8)
    val eps = rankError(200)
    val got = df.agg(kll_sketch_agg(col("x")).as("sk"))
      .select(kll_quantiles(col("sk"), Seq(0.1, 0.5, 0.9)).as("q"))
      .as[Seq[Double]].head()
    Seq(0.1, 0.5, 0.9).zip(got).foreach { case (p, est) =>
      val rank = est / n // values are 1..n so value/n is its rank
      assert(math.abs(rank - p) <= 3 * eps, s"p=$p est=$est rank=$rank")
    }
  }

  test("nulls don't aggregate; empty sketch reads null quantiles") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    val got = df.agg(kll_sketch_agg(col("x")).as("sk"))
      .select(kll_n(col("sk"))).as[Long].head()
    assert(got == 2L)
    val empty = Seq.empty[Double].toDF("x")
    val eq = empty.agg(kll_sketch_agg(col("x")).as("sk"))
      .select(kll_quantiles(col("sk"), Seq(0.5)).as("q"))
      .collect().head
    assert(eq.isNullAt(0))
  }
}
