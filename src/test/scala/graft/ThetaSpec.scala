package graft

import org.apache.spark.sql.functions._

/** Spark's built-in DataSketches theta bindings — the distinct-set
  * algebra q182 relies on: exact below saturation, intersection and
  * difference first-class.
  */
class ThetaSpec extends SparkSuite {
  import spark.implicits._

  private def est(c: org.apache.spark.sql.Column) =
    theta_sketch_estimate(c).cast("long")

  test("exact mode: estimates and set ops equal true set algebra, any partitioning") {
    val aKeys = (1L to 300L).toSet
    val bKeys = (200L to 450L).toSet
    for (parts <- Seq(1, 5)) {
      val df = (aKeys.toSeq.map(("a", _)) ++ bKeys.toSeq.map(("b", _)))
        .toDF("g", "k").repartition(parts)
      val sks = df.groupBy("g").agg(theta_sketch_agg(col("k")).as("sk"))
      val row = sks.filter(col("g") === "a").select(col("sk").as("ska"))
        .crossJoin(sks.filter(col("g") === "b").select(col("sk").as("skb")))
        .select(est(col("ska")),
          est(theta_intersection(col("ska"), col("skb"))),
          est(theta_difference(col("ska"), col("skb"))),
          est(theta_union(col("ska"), col("skb"))))
        .as[(Long, Long, Long, Long)].head()
      assert(row == (aKeys.size.toLong, (aKeys & bKeys).size.toLong,
        (aKeys -- bKeys).size.toLong, (aKeys | bKeys).size.toLong), s"parts=$parts")
    }
  }

  test("merge-of-parts ≡ build-over-whole in exact mode; string keys; nulls skipped") {
    val rows = Seq(("x", Some("u1")), ("x", Some("u2")), ("y", Some("u2")),
      ("y", Some("u3")), ("y", None))
    val df = rows.toDF("g", "k")
    val direct = df.agg(theta_sketch_agg(col("k")).as("sk"))
      .select(est(col("sk"))).as[Long].head()
    val merged = df.groupBy("g").agg(theta_sketch_agg(col("k")).as("psk"))
      .agg(theta_union_agg(col("psk")).as("msk"))
      .select(est(col("msk"))).as[Long].head()
    assert(direct == 3L && merged == 3L)
  }

  test("builds incrementally as a streaming aggregation ≡ batch (exact mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val agg = mem.toDF().toDF("k").agg(theta_sketch_agg(col("k")).as("sk"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("theta_stream").start()
    try {
      mem.addData(1L to 40L: _*); q.processAllAvailable()
      mem.addData(30L to 90L: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("theta_stream")
      .select(est(col("sk"))).as[Long].head()
    assert(streamed == 90L, s"stream-built distinct estimate: $streamed")
  }

  test("sampling regime: estimate within 5x RSE of truth") {
    val n = 100000
    val df = (1 to n).map(_.toLong).toDF("k").repartition(8)
    val e = df.agg(theta_sketch_agg(col("k"), lit(12)).as("sk"))
      .select(theta_sketch_estimate(col("sk"))).as[Long].head()
    val rse = 1.0 / math.sqrt(1 << 12)
    assert(math.abs(e.toDouble - n) / n <= 5 * rse, s"est=$e")
  }
}
