package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only diagnostic for the superlinear second decade (sf1→sf10):
  * prints candidate-generation statistics — bucket occupancy and
  * capped pair counts — for the LSH (q26/q66/q86) and winnowing (q40)
  * families at both scales, so the BASELINE.md "named fix" is based on
  * measured pair growth, not guessed.
  */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def lshStats(dir: String, bits: Int): Unit = {
      val em = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = em.count()
      val nv = em.select(col("vec_id").as("id"),
        graft.ext.Similarity.normalize(
          graft.ext.Similarity.vecD(col("embedding"))).as("nv"))
        .filter(col("nv").isNotNull)
      val bucketed = nv.select(col("id"),
        posexplode(graft.functions.LshBuckets.lsh_buckets(col("nv"), 16, bits))
          .as(Seq("table_idx", "bucket")))
      val occ = bucketed.groupBy(col("table_idx"), col("bucket"))
        .agg(count(lit(1)).as("b"))
      val row = occ.agg(
        count(lit(1)).as("n_buckets"),
        max(col("b")).as("max_b"),
        avg(col("b")).as("avg_b"),
        sum(when(col("b") <= 10000, (col("b") * (col("b") - 1) / 2).cast("long"))
          .otherwise(lit(0L))).as("capped_pairs")).head()
      println(s"[diag] LSH $dir bits=$bits: n=$n buckets=${row.getLong(0)} " +
        f"max=${row.getLong(1)} avg=${row.getDouble(2)}%.1f cappedPairs=${row.getLong(3)}")
    }

    def winnowStats(dir: String): Unit = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val fp = docs.select(col("doc_id"),
        explode(graft.functions.Winnow.winnow(col("text"), 24, 8)).as("fp"))
      val occ = fp.groupBy(col("fp")).agg(count(lit(1)).as("b"))
      val row = occ.agg(
        count(lit(1)).as("n_fps"),
        max(col("b")).as("max_b"),
        avg(col("b")).as("avg_b"),
        sum(when(col("b") <= 10000, (col("b") * (col("b") - 1) / 2).cast("long"))
          .otherwise(lit(0L))).as("capped_pairs")).head()
      println(s"[diag] WINNOW $dir: n=$n fps=${row.getLong(0)} " +
        f"max=${row.getLong(1)} avg=${row.getDouble(2)}%.1f cappedPairs=${row.getLong(3)}")
    }

    lshStats("/tmp/graft_sf1", 6)
    lshStats("/tmp/graft_sf10", 6)
    lshStats("/tmp/graft_sf10", 10)
    winnowStats("/tmp/graft_sf1")
    winnowStats("/tmp/graft_sf10")
    spark.stop()
  }
}
