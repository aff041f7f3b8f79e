package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the one `private[sql]` constructor the library's native
  * operator API needs: building a DataFrame from a custom LogicalPlan
  * (the extension-point Spark itself uses for every DataFrame API
  * method). Kept to this single call — everything else in the library
  * goes through public API.
  */
object GraftPlanApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
