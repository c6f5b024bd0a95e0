package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev-only: reproduce bench conditions (local[32], 32 shuffle
  * partitions, one count per query) for the hot queries and print
  * per-query wall times.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    // same warmup as Bench
    graft.SparkEntry.entry(spark).count()
    graft.SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001").count()

    val hot = args.toSeq match {
      case Nil => Seq("q22_minhash_neardup", "q23_simhash_neardup",
        "q33_explode_flatten", "q38_ann_ivf", "q26_ann_lsh",
        "q37_frame_sample", "q06_topk_per_group", "q35_multi_join",
        "q34_approx_distinct")
      case qs => qs
    }
    hot.foreach { q =>
      time(q)(graft.SparkEntry.queries(q)(spark, dir).count())
    }
    // second run to split JIT/codegen warmup from steady-state
    hot.foreach { q =>
      time(q + " (warm)")(graft.SparkEntry.queries(q)(spark, dir).count())
    }
    spark.stop()
  }
}
