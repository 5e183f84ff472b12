package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-placed bridge to the one `private[sql]` entry point a
  * whole-operator extension needs: wrapping a hand-built resolved
  * [[LogicalPlan]] back into a [[DataFrame]]. This is the standard
  * device third-party Spark engines (Delta Lake, Frameless, Sedona …)
  * use for custom logical nodes; everything else in this repo goes
  * through the public API.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
