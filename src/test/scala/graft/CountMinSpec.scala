package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketch

/** Count-min sketch guarantees ([[graft.ops.Sketch]]) that q135's
  * exact-mode oracle cannot isolate: the never-undercount bound under
  * forced collisions, bounded state however many distinct keys, and
  * partitioning invariance (the mergeability claim).
  */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  test("estimates never undercount, even at w=2 where collisions are forced") {
    val keys = ('a' to 'p').map(_.toString)
    val df = keys.zipWithIndex
      .flatMap { case (k, i) => Seq.fill(i + 1)(k) }.toDF("k")
    val truth = keys.zipWithIndex.map { case (k, i) => k -> (i + 1).toLong }.toMap
    val sk = Sketch.countMin(df, col("k"), depth = 2, width = 2)
    val est = Sketch.cmEstimate(sk, df, col("k"), depth = 2, width = 2)
      .as[(String, Long)].collect().toMap
    assert(est.keySet === truth.keySet)
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"undercount for $k: est ${est(k)} < true $n")
    }
    // and the total overcount is bounded by colliding traffic: no
    // estimate can exceed the whole corpus
    val total = truth.values.sum
    est.values.foreach(e => assert(e <= total))
  }

  test("exact when width comfortably exceeds the key set; unseen keys estimate 0, not null") {
    val df = Seq("x", "x", "y", "z", "z", "z").toDF("k")
    val sk = Sketch.countMin(df, col("k"), depth = 4, width = 512)
    val probes = Seq("x", "y", "z", "never_seen").toDF("k")
    val est = Sketch.cmEstimate(sk, probes, col("k"), depth = 4, width = 512)
      .as[(String, Long)].collect().toMap
    assert(est === Map("x" -> 2L, "y" -> 1L, "z" -> 3L, "never_seen" -> 0L))
  }

  test("state is bounded at d*w rows however many distinct keys; null keys excluded") {
    val df = (1 to 10000).map(i => i.toString).toDF("k")
      .union(Seq(null.asInstanceOf[String]).toDF("k"))
    val sk = Sketch.countMin(df, col("k"), depth = 3, width = 16)
    assert(sk.count() <= 3L * 16L)
    // every counter row belongs to a valid cell
    val cells = sk.select("h", "bucket").as[(Int, Long)].collect()
    assert(cells.forall { case (h, b) => h >= 0 && h < 3 && b >= 0 && b < 16 })
    // the null row contributed nowhere: total updates = 10000 * depth
    val sums = sk.groupBy("h").agg(sum("n").as("s")).as[(Int, Long)].collect().toMap
    assert(sums.values.toSeq === Seq.fill(3)(10000L), s"per-row totals: $sums")
  }

  test("merge of per-part sketches == sketch of the whole, exactly") {
    val whole = (1 to 300).map(i => ("k" + (i % 17), i)).toDF("k", "i")
    val parts = Seq(
      whole.filter(col("i") % 3 === 0),
      whole.filter(col("i") % 3 === 1),
      whole.filter(col("i") % 3 === 2))
    val merged = Sketch.merge(parts.map(p => Sketch.countMin(p, col("k"))))
    val direct = Sketch.countMin(whole, col("k"))
    val m = merged.as[(Int, Long, Long)].collect().toSet
    val d = direct.as[(Int, Long, Long)].collect().toSet
    assert(m === d)
  }

  test("partitioning invariance: the same sketch and estimates from any input layout") {
    val df = (1 to 500).map(i => ("k" + (i % 23))).toDF("k")
    val a = Sketch.cmEstimate(Sketch.countMin(df, col("k")), df, col("k"))
      .as[(String, Long)].collect().toMap
    val b = Sketch.cmEstimate(Sketch.countMin(df.repartition(13), col("k")),
        df.coalesce(1), col("k"))
      .as[(String, Long)].collect().toMap
    assert(a === b)
  }

  test("countMin builds incrementally as a streaming aggregation: counters after two micro-batches == batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = Sketch.countMin(mem.toDF().toDF("k"), col("k"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cm_out").start()
    try {
      mem.addData("a", "b", "a"); q.processAllAvailable()
      mem.addData("c", "a", "b"); q.processAllAvailable()
      val streamed = spark.table("cm_out").as[(Int, Long, Long)].collect().toSet
      val direct = Sketch.countMin(
          Seq("a", "b", "a", "c", "a", "b").toDF("k"), col("k"))
        .as[(Int, Long, Long)].collect().toSet
      assert(streamed === direct)
    } finally q.stop()
  }
}
