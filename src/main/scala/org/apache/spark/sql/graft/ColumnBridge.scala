package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 made `Column` backend-agnostic and moved the
  * Expression↔Column conversions behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this shim lives in
  * a `sql` subpackage to re-export them for the classic backend.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — the classic
    * backend's `Dataset.ofRows`, which is also `private[sql]`.
    */
  def ofRows(
      spark: org.apache.spark.sql.classic.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)
}
