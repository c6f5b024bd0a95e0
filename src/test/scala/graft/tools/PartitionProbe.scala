package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: interleaved A/B of `spark.sql.shuffle.partitions`
  * settings for one query on one fixture dir — the machine shows
  * bursty external variance (BENCH_NOTES), so back-to-back full runs
  * can't attribute a delta to the setting; alternating A,B,A,B,A,B in
  * ONE session cancels drift. Prints per-pass seconds and the
  * per-setting minima.
  *
  * Usage: SPARK_GRAFT_PROBE_DIR=/tmp/graft_sf10 \
  *        SPARK_GRAFT_PROBE_QUERY=q107_dsir_sample \
  *        SPARK_GRAFT_PROBE_PARTS=32,229 \
  *        sbt "Test / runMain graft.tools.PartitionProbe"
  */
object PartitionProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/tmp/graft_sf10")
    val query = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERY", "q107_dsir_sample")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "32,229")
      .split(',').map(_.trim.toInt).toSeq
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.ShortCircuitExists.install(spark)
    val fn = graft.SparkEntry.queries(query)
    fn(spark, dir).count() // warm (JIT, codegen, footers, page cache)
    val times = scala.collection.mutable.Map[Int, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to rounds; p <- parts) {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      times(p) = times(p) :+ t
      println(f"probe $query parts=$p%-6d ${t}%.2f s")
    }
    parts.foreach { p =>
      println(f"probe_min $query parts=$p%-6d ${times(p).min}%.2f s  " +
        s"(all: ${times(p).map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
