package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression interop bridge.
  *
  * Spark 4 made `Column` implementation-agnostic; the classic
  * conversions live in `private[sql]` scope, so third-party engines
  * expose them via a package-local shim (the same pattern public Spark
  * extension libraries use).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGERLY convert a Column to its catalyst expression tree —
    * [[expression]] wraps the column node lazily (an opaque
    * `ColumnNodeExpression`), which a structural inspector cannot
    * traverse; this runs the classic converter (SQL strings parsed,
    * dsl nodes recursed) so the tree is matchable.
    */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Build a DataFrame from a custom LogicalPlan (Dataset.ofRows is
    * private[sql]).
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
