package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.sources.Tables

/** Dev-only micro-profiler for the bench hotspots (not part of the
  * library surface; invoked manually while tuning). Currently: stage
  * decomposition of the MinHash near-dup chain (shared by
  * q22/q46/q48/q53).
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
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    graft.SparkEntry.entry(spark).count()  // warmup

    val docs = Tables.documents(spark, dir)
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      time("tokens only")(docs.select(size(Dedup.tokens(col("text"))).as("n")).agg(sum(col("n"))).collect())
      time("shingles")(docs.select(size(Dedup.shingles(col("text"), 3)).as("n")).agg(sum(col("n"))).collect())
      val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      time("shingles+minhash sig")(sh.select(
        graft.functions.MinHashSig.minhash_sig(col("sh"), 8).as("sig")).filter(col("sig").isNotNull).count())
      time("...+bands explode")(sh.select(col("id"), col("sh"),
          graft.functions.MinHashSig.minhash_sig(col("sh"), 8).as("sig"))
        .select(col("id"), explode(Dedup.bandKeys(col("sig"), 8, 2)).as("b")).count())
      time("full nearDupPairs")(Dedup.nearDupPairs(docs, col("doc_id"), col("text")).count())
    }
    spark.stop()
  }
}
