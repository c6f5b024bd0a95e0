package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing
import graft.sinks.Shards

class ShardsSpec extends SparkSuite {
  import spark.implicits._

  test("writeShards: one file per shard, manifest matches disk, order and content survive") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source")
    val assigned = Packing.shuffleShards(docs, col("doc_id"), 64L)
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      val manifest = Shards.writeShards(assigned, out)
      // the striping contract: exactly one data file per shard
      assert(manifest.nonEmpty && manifest.forall(_.n_files == 1),
        s"one-file-per-shard violated: $manifest")
      // manifest counts = the assignment's shard sizes
      val sizes = assigned.groupBy("shard_id").count()
        .as[(Long, Long)].collect().toMap
      assert(manifest.map(m => m.shard_id -> m.n_rows).toMap == sizes)
      // round trip: nothing lost or duplicated
      val back = spark.read.parquet(out).select("doc_id", "source")
      assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
      // within a shard file, rows sit in shuffle_rank order (the
      // reproducible training order INSIDE the file)
      val one = spark.read.parquet(manifest.head.files.head)
        .select("shuffle_rank").as[Long].collect()
      assert(one.sameElements(one.sorted), "shard file not rank-sorted")
      // re-derived manifest == returned manifest
      assert(Shards.buildManifest(spark, out) == manifest)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("writeShards: empty input yields an empty manifest, not an error") {
    val empty = Seq.empty[(Long, Long, Long)]
      .toDF("doc_id", "shard_id", "shuffle_rank")
    val out = java.nio.file.Files.createTempDirectory("graft_shards_empty").toString
    try {
      assert(Shards.writeShards(empty, out).isEmpty)
      assert(Shards.buildManifest(spark, out).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("writeShards refuses inputs without the shuffleShards schema") {
    val bad = Seq((1L, "x")).toDF("doc_id", "source")
    intercept[IllegalArgumentException] {
      Shards.writeShards(bad, "/tmp/never_written")
    }
  }
}
