package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ⊕ Training-shard writer — the terminal step of the
  * shuffle→pack→shard chain ([[graft.ops.Packing.shuffleShards]]
  * produced the assignment; this materializes it): ONE parquet file
  * per shard, laid out `out/shard_id=N/part-*.parquet`, plus a
  * `_manifest` parquet the trainer's data loader reads (shard → row
  * count, file path). Trainer workers stripe over shards by file, so
  * the one-file-per-shard invariant is the contract — a shard split
  * across files would double-serve its examples under naive striping.
  *
  * Plan: `repartition(shard_id)` then `partitionBy(shard_id)` writes
  * each shard's rows from exactly one task — one shuffle, and only
  * because rows must physically co-locate per output file (the same
  * reasoning as [[Bucketed]]); rows within a shard stay
  * `shuffle_rank`-sorted via `sortWithinPartitions`, preserving the
  * reproducible training order INSIDE each file. The manifest is
  * derived from the written directory (listing + per-shard counts),
  * so it reports what is actually on disk, not what the plan
  * intended.
  */
object Shards {

  /** One row per written shard. `n_files` is the invariant check —
    * always 1 per shard here; surfaced so a consumer can assert it.
    * `files` lists EVERY data file in the shard directory (sorted),
    * so a violated invariant is fully reported, not just counted.
    */
  final case class ShardManifest(shard_id: Long, n_rows: Long, n_files: Int,
                                 files: Seq[String])

  /** Write `df` (must carry `shard_id` and `shuffle_rank` — the
    * [[graft.ops.Packing.shuffleShards]] schema) under `outDir`,
    * one file per shard; writes `outDir/_manifest` and returns the
    * manifest sorted by shard.
    */
  def writeShards(df: DataFrame, outDir: String): Seq[ShardManifest] = {
    val spark = df.sparkSession
    require(df.columns.contains("shard_id") && df.columns.contains("shuffle_rank"),
      "writeShards needs shuffleShards' schema (shard_id, shuffle_rank)")
    df.repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("shuffle_rank"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(outDir)
    val manifest = buildManifest(spark, outDir)
    import spark.implicits._
    manifest.toDF().coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/_manifest")
    manifest
  }

  /** Re-derive the manifest from an on-disk shard directory. An
    * empty input produces NO shard directories (a partitioned write
    * of zero rows writes no data files) — that is an empty manifest,
    * not a schema-inference error, so the zero-shard case short
    * circuits before any parquet read.
    */
  def buildManifest(spark: SparkSession, outDir: String): Seq[ShardManifest] = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val shardDirs = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("shard_id="))
    if (shardDirs.isEmpty) return Seq.empty
    // partition-dir inference types shard_id as int on read-back —
    // normalize to long so the manifest key matches the writer's
    val counts = spark.read.parquet(outDir)
      .groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    shardDirs.map { st =>
      val sid = st.getPath.getName.stripPrefix("shard_id=").toLong
      val files = fs.listStatus(st.getPath).toSeq
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
      ShardManifest(sid, counts.getOrElse(sid, 0L), files.size,
        files.map(_.getPath.toString).sorted)
    }.sortBy(_.shard_id)
  }
}
