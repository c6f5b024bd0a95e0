package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._
import graft.sources.Tables
// throwaway decomposition probe for q166 (dev-only)
object Q166Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.SparkEntry.entry(spark).count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    def noisy(d: Column): Column = {
      val str = (c: Column) => c.cast("string")
      val r = str(d % 25)
      concat(
        when(d % 3 === 0, "HTTP://").when(d % 3 === 1, "http://").otherwise("https://"),
        when(d % 7 === 0, "User:pw@").otherwise(""),
        when(d % 2 === 0, concat(lit("Site"), r, lit(".Com")))
          .otherwise(concat(lit("site"), r, lit(".com"))),
        when(d % 5 === 0, when(d % 3 === 2, ":443").otherwise(":80")).otherwise(""),
        lit("/Page/"), r,
        when(d % 4 === 0, "/").otherwise(""),
        when(d % 2 === 0, concat(lit("?utm_source=feed&id="), r, lit("&utm_medium=x")))
          .otherwise(when(d % 11 === 0, concat(lit("?id="), r, lit("&fbclid=abc")))
            .otherwise(lit(""))),
        when(d % 6 === 0, "#top").otherwise(""))
    }
    val lex = Seq(
      "storage"   -> Seq("table", "row", "column", "key", "part"),
      "exec"      -> Seq("scan", "filter", "join", "sort", "merge", "hash"),
      "streaming" -> Seq("stream", "window", "batch"),
      "general"   -> Seq("query", "data", "value"))
    val docs = Tables.documents(spark, dir)
    val canon = docs.withColumn("canonical_url",
      graft.ext.UrlOps.canonicalize(noisy(col("doc_id"))))
    time("canonicalize")(canon.count())
    val s1 = graft.ops.TopK.perGroupHead(canon, col("canonical_url"), col("doc_id"), 1).drop("canonical_url")
    time("s1 perGroupHead")(s1.count())
    val chunks = graft.ext.Chunker.contentChunks(s1.select(col("doc_id"), col("text")), col("text"))
    time("contentChunks(s1)")(chunks.count())
    val labeled = chunks.select(col("doc_id"),
      graft.ext.TextAnalysis.classifyByLexicon(col("chunk"), lex).as("topic"))
    time("classify")(labeled.count())
    val perTopic = labeled.groupBy(col("doc_id"), col("topic")).agg(count(lit(1)).as("top_cnt"))
    val top = graft.ops.TopK.perGroupTopK(perTopic, Seq(col("doc_id")), Seq(desc("top_cnt"), asc("topic")), 1)
    val nch = perTopic.groupBy(col("doc_id")).agg(sum(col("top_cnt")).as("n_chunks"))
    val pass = top.join(nch, Seq("doc_id"))
      .filter(col("top_cnt") * 5 >= col("n_chunks") * 4).select(col("doc_id"))
    val s2 = s1.join(pass, Seq("doc_id"))
    time("s2 gate")(s2.count())
    val mix = graft.ops.Sampling.temperatureMixture(s2, col("source"), "doc_id", totalN = 150)
    time("mixture")(mix.count())
    time("full q166")(graft.SparkEntry.queries("q166_pipeline_r12")(spark, dir).count())
    spark.stop()
  }
}
