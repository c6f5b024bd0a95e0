package graft

import org.apache.spark.sql.functions._

/** Spark's built-in DataSketches KLL bindings, in the regimes the
  * engine relies on (q181): exact below k, mergeable always.
  */
class KllSpec extends SparkSuite {
  import spark.implicits._

  private def sk(c: org.apache.spark.sql.Column) = kll_sketch_agg_double(c, lit(200))

  test("exact regime (n <= k): quantiles equal the inclusive-rank exact values, any partitioning") {
    val vals = (1 to 150).map(_.toDouble * 3)
    for (parts <- Seq(1, 4, 9)) {
      val df = vals.toDF("x").repartition(parts)
      val got = df.agg(sk(col("x")).as("sk"))
        .select(kll_sketch_get_n_double(col("sk")).as("n"),
          array(Seq(0.1, 0.5, 0.9, 1.0).map(p =>
            kll_sketch_get_quantile_double(col("sk"), lit(p))): _*).as("q"))
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
    def readout(skCol: String, df: org.apache.spark.sql.DataFrame) =
      df.select(array(Seq(0.25, 0.5, 0.75).map(p =>
          kll_sketch_get_quantile_double(col(skCol), lit(p))): _*).as("q"),
        kll_sketch_get_n_double(col(skCol)).as("n"))
        .as[(Seq[Double], Long)].head()
    val direct = readout("sk", whole.agg(sk(col("x")).as("sk")))
    val merged = readout("msk", whole.groupBy(col("g")).agg(sk(col("x")).as("psk"))
      .agg(kll_merge_agg_double(col("psk")).as("msk")))
    assert(direct == merged, s"$direct vs $merged")
    // approximate regime: exact values may drift, n never does
    val big = (1 to 100000).map(i => (i % 7).toString -> i.toDouble).toDF("g", "x")
    val nDirect = big.agg(sk(col("x")).as("sk"))
      .select(kll_sketch_get_n_double(col("sk"))).as[Long].head()
    val nMerged = big.groupBy("g").agg(sk(col("x")).as("psk"))
      .agg(kll_merge_agg_double(col("psk")).as("msk"))
      .select(kll_sketch_get_n_double(col("msk"))).as[Long].head()
    assert(nDirect == 100000L && nMerged == 100000L)
  }

  test("approximate regime: estimates stay within 3x the published rank error") {
    val n = 50000
    val df = (1 to n).map(_.toDouble).toDF("x").repartition(8)
    val eps = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(200, false)
    val got = df.agg(sk(col("x")).as("sk"))
      .select(array(Seq(0.1, 0.5, 0.9).map(p =>
        kll_sketch_get_quantile_double(col("sk"), lit(p))): _*))
      .as[Seq[Double]].head()
    Seq(0.1, 0.5, 0.9).zip(got).foreach { case (p, est) =>
      val rank = est / n // values are 1..n so value/n is its rank
      assert(math.abs(rank - p) <= 3 * eps, s"p=$p est=$est rank=$rank")
    }
  }

  test("builds incrementally as a streaming aggregation ≡ batch (exact regime)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Double]
    val agg = mem.toDF().toDF("x").agg(sk(col("x")).as("sk"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("kll_stream").start()
    val b1 = (1 to 40).map(_.toDouble)
    val b2 = (41 to 90).map(_.toDouble)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("kll_stream")
      .select(kll_sketch_get_n_double(col("sk")).as("n"),
        kll_sketch_get_quantile_double(col("sk"), lit(0.5)).as("p50"))
      .as[(Long, Double)].head()
    val batch = (b1 ++ b2).toDF("x").agg(sk(col("x")).as("sk"))
      .select(kll_sketch_get_n_double(col("sk")).as("n"),
        kll_sketch_get_quantile_double(col("sk"), lit(0.5)).as("p50"))
      .as[(Long, Double)].head()
    assert(streamed == batch, s"$streamed vs $batch")
  }

  test("nulls don't aggregate") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    val got = df.agg(sk(col("x")).as("sk"))
      .select(kll_sketch_get_n_double(col("sk"))).as[Long].head()
    assert(got == 2L)
  }
}
