package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-partitioned lake layout (the standard 100 TB arrangement for
  * event data): write with a derived day-partition column so
  * time-window predicates become DIRECTORY pruning — a `p_date`
  * filter never opens the other days' files, turning the X13
  * time-filter family from a scan predicate into file skipping.
  * Combine with [[Bucketed]] for co-located joins within a day.
  */
object Partitioned {

  val dateCol = "p_date"

  /** Write `df` partitioned by the calendar day of `tsCol`. */
  def writeByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn(dateCol, date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy(dateCol).parquet(path)

  /** Day-range predicate on the partition column — string comparison
    * on yyyy-MM-dd is date order, so this prunes at planning time.
    */
  def dayRange(from: String, until: String): org.apache.spark.sql.Column =
    col(dateCol) >= from && col(dateCol) < until
}
