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

  /** Wrap a Catalyst expression as a user-facing Column — the inverse
    * bridge, needed by the SQL DML translation
    * ([[graft.plans.SqlDml]]) to hand a parsed WHERE/SET expression to
    * the library's Column-typed table operations. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
