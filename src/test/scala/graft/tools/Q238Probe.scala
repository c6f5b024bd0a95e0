package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time the q238 sub-chains separately. */
object Q238Probe {
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
    // mirror bandingRecallDocs
    val m3 = (col("doc_id") % 50 - 47) * 3
    val g = expr("doc_id div 50")
    val chainText = array_join(transform(sequence(m3 + 1, m3 + 20),
      j => concat(lit("qbr"), g.cast("string"), lit("w"),
        j.cast("string"))), " ")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 50 >= 47, chainText)
          .otherwise(col("text")).as("text"))
    for (pass <- 1 to 2) {
      time(s"exact@0.5 pass$pass")(
        graft.ext.Dedup.setSimJoinExact(docs, col("doc_id"), col("text"),
          threshold = 0.5).count())
      time(s"exact@0.8 pass$pass")(
        graft.ext.Dedup.setSimJoinExact(docs, col("doc_id"), col("text"),
          threshold = 0.8).count())
      time(s"banded 8x2 @0.5 pass$pass")(
        graft.ext.Dedup.nearDupPairs(docs, col("doc_id"), col("text"),
          numHashes = 8, rowsPerBand = 2, threshold = 0.5).count())
      time(s"ckpt exact@0.5 pass$pass") {
        val df = graft.ext.Dedup.setSimJoinExactRaw(docs, col("doc_id"),
          col("text"), threshold = 0.5).localCheckpoint()
        df.count()
      }
    }
    spark.stop()
  }
}
