package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only shim: `classic.Dataset.ofRows` is `private[sql]`, and the
  * GuardBandSweepSpec needs to execute a surgically-rewritten analyzed
  * plan (publish-round widening). Lives in the Spark package solely to
  * cross that boundary; never shipped — test classpath only.
  */
object GraftTestPlans {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
