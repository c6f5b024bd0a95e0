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
}
