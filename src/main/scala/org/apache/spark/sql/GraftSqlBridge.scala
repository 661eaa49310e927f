package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge for graft's SQL-DML routing: turn an
  * analyzed child plan back into a DataFrame, and a catalyst
  * Expression into a user-facing Column. Both are stable internals
  * every DSv2 connector leans on; isolating them here keeps the graft
  * codebase proper free of `org.apache.spark.sql` package poking.
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The analyzed logical plan of a DataFrame — the inverse of
    * [[ofRows]], used to splice a lake time-travel read into a SQL
    * query plan in place of its `VERSION AS OF` relation.
    */
  def planOf(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
