package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.sources.Tables

/** Dev-only micro-profiler for the bench hotspots (not part of the
  * library surface; invoked manually while tuning).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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

    val docs = Tables.documents(spark, dir)
    time("tokenize+shingle")(docs.select(Dedup.shingles(col("text"), 3).as("sh"))
      .select(sum(size(col("sh")))).head.getLong(0))
    val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("1 minhash")(sh.select(Dedup.minhash(col("sh"), 0).as("h")).filter(col("h").isNotNull).count())
    time("8 minhash")(sh.select((0 until 8).map(i => Dedup.minhash(col("sh"), i).as(s"h$i")): _*).count())
    time("bands")(sh.select(col("id"),
      explode(Dedup.bandKeys(
        graft.functions.MinHashSig.minhash_sig(col("sh"), 8), 8, 2)).as("b")).count())
    time("full pipeline")(Dedup.nearDupPairs(docs, col("doc_id"), col("text")).count())
    locally {
      val q = Dedup.nearDupPairs(docs, col("doc_id"), col("text"))
      q.count()
      val p = q.queryExecution.executedPlan.toString
      println("REUSED_EXCHANGE=" + p.contains("ReusedExchange"))
      println(p.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Scan parquet")).mkString("\n"))
    }

    val em = Tables.embeddings(spark, dir)
    import graft.ext.Similarity
    val nv = em.select(col("vec_id").as("id"), Similarity.normalize(Similarity.vecD(col("embedding"))).as("nv"))
    time("normalize")(nv.count())
    time("norm+join cross 1k")(nv.limit(1000).crossJoin(nv.limit(1000).select(col("nv").as("nv2")))
      .select(Similarity.dot(col("nv"), col("nv2")).as("d")).filter(col("d") > 2).count())
    Seq("q01_pricing_summary", "q13_keyword_search", "q35_multi_join", "q06_topk_per_group")
      .foreach { q =>
        println(s"===== $q =====")
        val plan = graft.SparkEntry.queries(q)(spark, dir)
          .queryExecution.executedPlan.toString
        println(plan.linesIterator.filter(l =>
          l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("Join") || l.contains("WindowGroupLimit") ||
          l.contains("TakeOrdered")).mkString("\n"))
      }

    val knn = graft.SparkEntry.queries("q24_knn_brute")(spark, dir)
    time("q24 warm 1")(knn.count())
    time("q24 warm 2")(graft.SparkEntry.queries("q24_knn_brute")(spark, dir).count())
    val nv2 = em.select(col("vec_id").as("id"), Similarity.normalize(Similarity.vecD(col("embedding"))).as("nv"))
      .filter(col("nv").isNotNull)
    val q2 = nv2.filter(col("id").isin(0L, 1L, 2L))
      .select(col("id").as("query_id"), col("nv").as("q_nv"))
    val scored = nv2.join(broadcast(q2), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(Similarity.dot(col("q_nv"), col("nv")), 4).as("cos_sim"))
    time("q24 scored only")(scored.count())
    time("q24 nv only")(nv2.count())
    time("q24 broadcast q only")(q2.count())
    spark.stop()
  }
}
