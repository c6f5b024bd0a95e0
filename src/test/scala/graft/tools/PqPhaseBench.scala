package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: split the PQ-family queries' bench time into FIT seconds
  * (the two k-means trainings — corpus passes whose cost amortizes
  * fit-once/search-many in production) and SEARCH/DEDUP seconds (the
  * probe/ADC or SDC pair-scan side — the part that runs per query /
  * per increment at 100 TB). The official Bench line times each query
  * end-to-end, so a search-path regression is invisible inside the
  * fit-dominated number (VERDICT r11 #5); this tool is the protocol
  * that makes the two visible separately. Results → BENCH_NOTES.
  *
  * Protocol: warmed session (same as Bench), min of 3 passes per
  * phase. Fit timing materializes exactly what the query's fit stage
  * materializes (ivfFit/pqFit both persist + count their outputs);
  * search timing reuses ONE fitted model pair and times only the
  * downstream count(), so (fit + search) of this tool brackets the
  * official per-query seconds.
  */
object PqPhaseBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.ShortCircuitExists.install(spark)
    graft.SparkEntry.entry(spark).count()

    val em = graft.sources.Tables.embeddings(spark, sfDir)
    def minOf3(f: () => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min

    def fitPair() = {
      val ivf = graft.ext.Similarity.ivfFit(em, col("vec_id"), col("embedding"),
        k = 16, iters = 2, quantize = Some(9))
      val pq = graft.ext.Similarity.pqFit(em, col("vec_id"), col("embedding"),
        m = 4, k = 16, iters = 1, quantize = Some(9))
      (ivf, pq)
    }

    // fit: time the two trainings end-to-end (persist+count inside)
    val tFit = minOf3 { () =>
      val (ivf, pq) = fitPair(); ivf.unpersist(); pq.unpersist()
    }
    // one shared model pair for the search-side timings
    val (ivf, pq) = fitPair()

    val phases = Seq(
      "q143_ivfpq.search" -> (() => {
        graft.ext.Similarity.ivfPqSearch(ivf, pq, Seq(0L, 1L, 2L),
          nprobe = 4, k = 10).count(); ()
      }),
      "q148_ivfpq_batch.search" -> (() => {
        graft.ext.Similarity.ivfPqSearchDf(ivf, pq,
          em.filter(col("vec_id") % 97 === 0), col("vec_id"), col("embedding"),
          nprobe = 4, k = 10).count(); ()
      }),
      "q145_semdedup_pq.dedup" -> (() => {
        graft.ext.Similarity.semDedupPq(ivf, pq, tau = 0.25).count(); ()
      }))
    println(f"pq_phase fit_s=$tFit%.2f  (ivfFit k=16 iters=2 + pqFit m=4 k=16, shared by all queries below)")
    phases.foreach { case (name, f) =>
      println(f"pq_phase $name%-28s ${minOf3(f)}%.2f s  (+ fit_s for the end-to-end query)")
    }
    spark.stop()
  }
}
