package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity}
import graft.sources.Tables

/** Dev-only micro-profiler for the bench hotspots (not part of the
  * library surface; invoked manually while tuning). Currently: the
  * q66 tail — where does time go after the propagation loop ends?
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

    // warmup
    graft.SparkEntry.entry(spark).count()

    val em = Tables.embeddings(spark, dir)
    val pairs = Similarity.annLsh(em, col("vec_id"), col("embedding"), threshold = 0.42)
    time("annLsh count")(pairs.count())
    time("annLsh count (warm)")(
      Similarity.annLsh(em, col("vec_id"), col("embedding"), threshold = 0.42).count())

    val p2 = Similarity.annLsh(em, col("vec_id"), col("embedding"), threshold = 0.42)
    val clustered = time("dupClusters construction (loop)")(Dedup.dupClusters(p2))
    time("final count (join+orderBy)")(clustered.count())
    time("final count again (cached)")(clustered.count())

    val p3 = Similarity.annLsh(em, col("vec_id"), col("embedding"), threshold = 0.42)
    val c3 = time("dupClusters construction 2")(Dedup.dupClusters(p3))
    time("q66-shaped select+orderBy count")(
      c3.select(col("doc_id").as("vec_id"), col("cluster_id"), col("cluster_size"))
        .orderBy(col("vec_id")).count())
    spark.stop()
  }
}
