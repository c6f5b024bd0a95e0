package graft

import org.apache.spark.sql.types.{TimestampType, TimestampNTZType, LongType}
import graft.sources.Tables

/** Fixture-schema canary (VERDICT r10 §next-round #2): the driver
  * regenerates /root/testdata between rounds and has already shipped
  * `events.ts` as nanos-long, TIMESTAMP_NTZ(µs), and UTC µs across
  * generations. If the fixture drifts again this spec fails with a
  * one-line diagnosis naming the table and the new physical type,
  * instead of 32 queries silently erroring at construction.
  */
class FixtureCanarySpec extends SparkSuite {

  private val tables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  private val readers: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "region"     -> Tables.region _,
    "nation"     -> Tables.nation _,
    "customer"   -> Tables.customer _,
    "supplier"   -> Tables.supplier _,
    "part"       -> Tables.part _,
    "orders"     -> Tables.orders _,
    "lineitem"   -> Tables.lineitem _,
    "events"     -> Tables.events _,
    "documents"  -> Tables.documents _,
    "embeddings" -> Tables.embeddings _
  )

  for (t <- tables) {
    test(s"Tables.$t analyzes against the current fixture") {
      // .schema forces analysis: any reader-side expression that no
      // longer resolves against the on-disk physical types throws here.
      val df =
        try readers(t)(spark, sfDir)
        catch {
          case e: Exception =>
            val raw = spark.read.parquet(s"$sfDir/$t.parquet").schema.treeString
            fail(s"Tables.$t no longer analyzes — fixture schema drifted.\nRaw parquet schema:\n$raw", e)
        }
      assert(df.schema.fieldNames.nonEmpty)
    }
  }

  test("events.ts decodes to canonical TimestampType whatever the fixture generation") {
    val rawTs = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    assert(
      Set[org.apache.spark.sql.types.DataType](LongType, TimestampNTZType, TimestampType)(rawTs),
      s"events.ts physical type drifted to $rawTs — extend the dispatch in Tables.events")
    val decoded = Tables.events(spark, sfDir).schema("ts").dataType
    assert(decoded == TimestampType,
      s"Tables.events must normalize ts to TimestampType, got $decoded (raw fixture type: $rawTs)")
    // And the decoded values must be readable end-to-end, not just analyzable.
    assert(Tables.events(spark, sfDir).selectExpr("max(ts)").head().get(0) != null)
  }
}
