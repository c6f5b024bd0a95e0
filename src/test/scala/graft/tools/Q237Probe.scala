package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time q237's sub-chains separately. */
object Q237Probe {
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
      println(f"$name%-38s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val dec = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" the and that have with."))
          .otherwise(lit(""))).as("__t"))
    for (pass <- 1 to 2) {
      time(s"lm train+score ckpt p$pass") {
        val model = graft.ext.TextAnalysis.charBigramLm(
          dec.filter(col("doc_id") % 2 === 0), col("__t"))
        graft.ext.TextAnalysis.lmScore(dec, col("doc_id"), col("__t"), model)
          .localCheckpoint().count()
      }
      time(s"repetition gate p$pass")(
        graft.ext.TextAnalysis.gopherRepetitionGate(dec, col("doc_id"), col("__t"))
          .count())
      time(s"quality gate + dict p$pass")(
        dec.select(
          graft.ext.TextAnalysis.gopherQualityGate(col("__t"), minWords = 10)
            .getField("passes").as("g"),
          graft.functions.DictMatch.dict_contains_any(col("__t"),
            graft.functions.DictMatch.automaton(Seq(
              "slow scan", "big table", "merge conflict", "drop part",
              "small batch", "stale key", "stream", "vector", "conflictfree",
              "fast merge", "slow join", "bad data"))).as("b")).count())
      time(s"full q237 p$pass")(
        graft.SparkEntry.queries("q237_screen_overlap")(spark, dir).count())
    }
    spark.stop()
  }
}
