package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `new Column(expr)` internal (Column is ColumnNode-backed);
  * the supported conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]`. This one-liner inside the `org.apache.spark.sql`
  * package tree exposes it to graft's custom Expressions — the standard
  * pattern for Spark-native extension libraries (no Spark internals are
  * modified, only accessed).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a (resolved) LogicalPlan — classic
    * Dataset.ofRows is private[sql]; needed to hand custom logical
    * nodes (graft.plans.AsOfJoinNode) back to the public API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
