package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's classic Column↔Expression converters are `private[sql]`
  * (the Column API went ColumnNode-based in the Connect refactor).
  * Custom Catalyst expressions still need the conversion to surface as
  * `Column`s, so this bridge lives under the `org.apache.spark.sql`
  * package — the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on a LIVE session (`sessionState` is
    * `private[sql]`, hence bridged). Builder-time
    * `SparkSessionExtensions.injectFunction` only applies to sessions
    * constructed with the extension; this covers the
    * already-running-session case.
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       id: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)

  /** Catalog metadata for a managed/external table: (location,
    * bucket spec as (numBuckets, bucketColumns) when bucketed).
    * `sessionState.catalog` is `private[sql]`, hence bridged — used by
    * the bucketed snapshot-diff fast path to resolve and VALIDATE the
    * physical layout instead of trusting the caller's description.
    */
  def tableLayout(spark: org.apache.spark.sql.SparkSession,
                  table: String): (String, Option[(Int, Seq[String])]) = {
    val meta = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    (meta.location.toString,
      meta.bucketSpec.map(bs => (bs.numBuckets, bs.bucketColumnNames)))
  }
}
