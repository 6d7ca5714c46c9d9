package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` access shim: build a DataFrame from a custom
  * LogicalPlan node. Spark 4 moved `Dataset.ofRows` behind the
  * sql-private `classic` package, so extension libraries adding their
  * own logical operators place a one-liner here — the same device the
  * Delta Lake and Iceberg Spark runtimes use for their plan nodes.
  */
object GraftPlanShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
