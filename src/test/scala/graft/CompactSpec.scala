package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.Compact

class CompactSpec extends SparkSuite {

  private def smallFiles(n: Int): String = {
    val dir = Files.createTempDirectory("graft_compact_in").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(n)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("compaction collapses many small files into the size-derived target count, content-identical") {
    val in = smallFiles(32)
    val out = Files.createTempDirectory("graft_compact_out").toString
    val stats = Compact.compactParquet(spark, in, out,
      targetFileBytes = Long.MaxValue) // everything fits one file
    assert(stats.filesBefore == 32 && stats.targetFiles == 1 && stats.filesAfter == 1,
      s"unexpected stats: $stats")
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(a.except(b).isEmpty && b.except(a).isEmpty && a.count() == b.count(),
      "compaction must be content-preserving")
  }

  test("target count follows bytes/targetFileBytes; shuffle mode balances evenly") {
    val in = smallFiles(16)
    val bytes = new java.io.File(in).listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length).sum
    val out = Files.createTempDirectory("graft_compact_out").toString
    val target = bytes / 3 // → ceil(3.x) = 3 or 4 files
    val stats = Compact.compactParquet(spark, in, out, targetFileBytes = target,
      shuffle = true)
    assert(stats.targetFiles == math.ceil(bytes.toDouble / target).toInt)
    assert(stats.filesAfter == stats.targetFiles,
      s"shuffle mode writes exactly the planned file count: $stats")
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("refuses in-place rewrite and empty input") {
    val in = smallFiles(2)
    intercept[IllegalArgumentException] {
      Compact.compactParquet(spark, in, in)
    }
    // same directory spelled differently must not slip past the guard
    intercept[IllegalArgumentException] {
      Compact.compactParquet(spark, s"file:$in", in)
    }
    val empty = Files.createTempDirectory("graft_compact_empty").toString
    intercept[IllegalArgumentException] {
      Compact.compactParquet(spark, empty,
        Files.createTempDirectory("graft_compact_out2").toString)
    }
  }
}
