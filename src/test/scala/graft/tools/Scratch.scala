package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.sources.Tables

/** Dev-only micro-profiler for the bench hotspots (not part of the
  * library surface; invoked manually while tuning). Currently: does
  * ivfFit's nv.unpersist() invalidate the assigned cache (the same
  * recompile-on-unpersist trap dupClusters hit)?
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    graft.SparkEntry.entry(spark).count()  // warmup

    val em = Tables.embeddings(spark, dir)
    val model = time("ivfFit")(
      Similarity.ivfFit(em, col("vec_id"), col("embedding"), k = 16, quantize = Some(6)))
    time("assigned count 1")(model.assigned.count())
    time("assigned count 2 (should be ~0)")(model.assigned.count())
    time("ivfSearch")(
      Similarity.ivfSearch(model, Seq(0L, 1L, 2L), nprobe = 4, k = 10).count())
    time("ivfSearch again")(
      Similarity.ivfSearch(model, Seq(0L, 1L, 2L), nprobe = 4, k = 10).count())
    time("q38 end-to-end")(graft.SparkEntry.queries("q38_ann_ivf")(spark, dir).count())
    time("q38 end-to-end again")(graft.SparkEntry.queries("q38_ann_ivf")(spark, dir).count())
    spark.stop()
  }
}
