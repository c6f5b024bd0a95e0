package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** ⊕ Small-file compaction — the lake-maintenance pass every
  * long-running ingestion needs: streaming micro-batches, per-day
  * partitions and CDC merges each leave files far below the
  * scan-efficient size, and at 100 TB the resulting footer/open cost
  * dominates reads (a million 1 MB files is a metadata storm; the
  * same bytes in 8k × 128 MB files scan at full throughput).
  *
  * Shape: the file LISTING is the only driver-side work — O(#files)
  * names, no data. The target file count derives from real on-disk
  * bytes / `targetFileBytes`; the rewrite itself is one distributed
  * job. Two packing modes:
  *
  *  - `shuffle = false` (default): `coalesce` — shuffle-free; the
  *    parquet scan has already combined small files into
  *    `spark.sql.files.maxPartitionBytes`-sized splits, so the merge
  *    inherits that size balance without moving rows between
  *    executors. The right mode for pure compaction.
  *  - `shuffle = true`: round-robin `repartition` — pays one full
  *    shuffle for exactly-even output files; for when the input is
  *    pathologically skewed (one 10 GB file among thousands of 1 MB
  *    ones) or the row order is worthless anyway.
  *
  * Output sizes are estimates (re-encoding changes compression
  * ratios); the contract is "about targetFileBytes", not exact —
  * same stance as every engine's OPTIMIZE/compact.
  */
object Compact {

  /** Before/after accounting — what a maintenance job reports. */
  final case class CompactStats(filesBefore: Int, bytesBefore: Long,
                                filesAfter: Int, bytesAfter: Long,
                                targetFiles: Int)

  private def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => (st.getPath.toString, st.getLen))
  }

  /** Rewrite the parquet directory `inDir` into ~`targetFileBytes`
    * files under `outDir`. Returns the before/after stats (the
    * compacted data is `spark.read.parquet(outDir)`).
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetFileBytes: Long = 128L << 20,
                     shuffle: Boolean = false): CompactStats = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    // qualify both paths through the filesystem (scheme + working dir)
    // so "file:/x" vs "/x" or relative vs absolute spellings of the
    // SAME directory cannot slip past the in-place guard
    val conf = spark.sessionState.newHadoopConf()
    def qualified(d: String): Path = {
      val p = new Path(d)
      p.getFileSystem(conf).makeQualified(p)
    }
    require(qualified(inDir) != qualified(outDir),
      "compaction cannot rewrite a directory onto itself (reads would race the overwrite)")
    val before = dataFiles(spark, inDir)
    require(before.nonEmpty, s"no data files under $inDir")
    val bytesBefore = before.map(_._2).sum
    val n = math.max(1, math.ceil(bytesBefore.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inDir)
    val packed = if (shuffle) df.repartition(n) else df.coalesce(n)
    packed.write.mode("overwrite").parquet(outDir)
    val after = dataFiles(spark, outDir)
    CompactStats(before.size, bytesBefore, after.size, after.map(_._2).sum, n)
  }
}
