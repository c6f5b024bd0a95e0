package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table sink: the pre-shuffle co-location lever for 100 TB
  * fact⋈fact joins. Writing both sides bucketed (and sorted) by the
  * join key with the same bucket count lets Catalyst plan a
  * sort-merge join with NO Exchange on either side — the shuffle is
  * paid once at write time and amortized over every subsequent join,
  * which is the right trade for repeatedly-joined warehouse tables
  * (orders⋈lineitem-shaped workloads).
  */
object Bucketed {

  /** Write `df` as a bucketed, sorted managed table. */
  def write(df: DataFrame, table: String, bucketCol: String, buckets: Int,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With equal
    * bucket counts this plans shuffle-free (verified in
    * BucketedSpec by asserting no Exchange in the physical plan).
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
