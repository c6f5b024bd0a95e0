package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.Tables

/** [[Tables.readNormalized]] — schema-tolerant reads (VERDICT r10 #7):
  * the same logical fixture written three ways (ns-epoch long, µs
  * TIMESTAMP_NTZ, µs UTC-adjusted TIMESTAMP) must read identically,
  * int32 widens to int64, float widens to double, and an incompatible
  * or missing column fails loudly with the schema diff — never a
  * silent null or wrap.
  */
class ReadNormalizedSpec extends SparkSuite {
  import spark.implicits._

  private val expected = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", TimestampType),
    StructField("v", DoubleType)))

  // Two instants a µs apart, to catch any ns→µs boundary mistake.
  private val microsA = 1767225600000000L // 2026-01-01T00:00:00Z
  private val microsB = microsA + 1L

  private def tmp(slug: String): String =
    java.nio.file.Files.createTempDirectory(s"readnorm_$slug").toString + "/t.parquet"

  private def canonical(path: String): Seq[(Long, Long, Double)] =
    Tables.readNormalized(spark, path, expected)
      .selectExpr("id", "unix_micros(ts)", "v")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)

  test("ns-long, µs-NTZ, and µs-LTZ variants of one fixture read identically") {
    val ltz = tmp("ltz")
    Seq((1L, microsA, 1.5), (2L, microsB, 2.5)).toDF("id", "us", "v")
      .selectExpr("id", "timestamp_micros(us) AS ts", "v")
      .write.parquet(ltz)

    val ntz = tmp("ntz")
    Seq((1L, microsA, 1.5), (2L, microsB, 2.5)).toDF("id", "us", "v")
      .selectExpr("id", "CAST(timestamp_micros(us) AS TIMESTAMP_NTZ) AS ts", "v")
      .write.parquet(ntz)

    val nsLong = tmp("ns") // ns-epoch long, as TIMESTAMP(NANOS) surfaces under nanosAsLong
    Seq((1L, microsA * 1000L + 999L, 1.5), (2L, microsB * 1000L, 2.5))
      .toDF("id", "ts", "v").write.parquet(nsLong)

    val want = Seq((1L, microsA, 1.5), (2L, microsB, 2.5))
    assert(canonical(ltz) == want)
    assert(canonical(ntz) == want)
    assert(canonical(nsLong) == want) // 999 trailing ns truncate away
    assert(Tables.readNormalized(spark, ltz, expected).schema("ts").dataType == TimestampType)
    assert(Tables.readNormalized(spark, ntz, expected).schema("ts").dataType == TimestampType)
    assert(Tables.readNormalized(spark, nsLong, expected).schema("ts").dataType == TimestampType)
  }

  test("integral and float widening; extra on-disk columns pruned in expected order") {
    val p = tmp("widen")
    Seq((7, 1.5f, "extra")).toDF("id", "v", "junk").write.parquet(p)
    val out = Tables.readNormalized(spark, p, expected.copy(fields =
      expected.fields.filterNot(_.name == "ts")))
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      Seq("id" -> LongType, "v" -> DoubleType))
    assert(out.as[(Long, Double)].collect().toSeq == Seq((7L, 1.5)))
  }

  test("missing column and non-coercible type fail loudly with the schema diff") {
    val p = tmp("bad")
    Seq((1L, "not_a_timestamp", 1.0)).toDF("id", "ts", "v").write.parquet(p)
    val e1 = intercept[IllegalStateException](Tables.readNormalized(spark, p, expected))
    assert(e1.getMessage.contains("'ts'") && e1.getMessage.contains("on disk"))

    val p2 = tmp("missing")
    Seq((1L, 1.0)).toDF("id", "v").write.parquet(p2)
    val e2 = intercept[IllegalStateException](Tables.readNormalized(spark, p2, expected))
    assert(e2.getMessage.contains("missing"))
  }

  test("re-cased on-disk columns coerce (resolver-consistent), output keeps expected names") {
    val p = tmp("cased")
    Seq((7, 1.5f)).toDF("ID", "V").write.parquet(p)
    val out = Tables.readNormalized(spark, p, expected.copy(fields =
      expected.fields.filterNot(_.name == "ts")))
    // default case-insensitive resolution: 'ID' satisfies 'id', and the
    // OUTPUT carries the expected casing, not the disk casing
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      Seq("id" -> LongType, "v" -> DoubleType))
    assert(out.as[(Long, Double)].collect().toSeq == Seq((7L, 1.5)))
  }

  test("readNormalized reproduces Tables.events on the live fixture") {
    val direct = Tables.events(spark, sfDir)
    val viaNorm = Tables.readNormalized(spark, s"$sfDir/events.parquet", direct.schema)
    assert(viaNorm.schema("ts").dataType == TimestampType)
    assert(viaNorm.selectExpr("sum(unix_micros(ts))", "count(*)").head() ==
      direct.selectExpr("sum(unix_micros(ts))", "count(*)").head())
  }
}
