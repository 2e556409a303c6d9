package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql] Dataset.ofRows` — the standard technique Spark
  * extension libraries use to materialize a DataFrame from a custom logical
  * plan node (the public Dataset API has no entry point for injected plans).
  * Kept to this single call on purpose. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
