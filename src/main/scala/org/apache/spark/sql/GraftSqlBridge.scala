package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface — the standard shim any
  * Spark extension library ships so it can materialize a DataFrame
  * from a custom LogicalPlan node (Dataset.ofRows is package-private).
  * Nothing else from the internal API is exposed.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → catalyst Expression (Column wraps a ColumnNode since
    * 4.0). Eagerly converted — NOT the lazy ColumnNodeExpression shim,
    * which custom plan nodes can't serialize — so attributes come back
    * as UnresolvedAttribute and the caller binds them to its child.
    */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
