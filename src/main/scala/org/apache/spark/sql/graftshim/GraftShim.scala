package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the Column <-> Expression converters that Spark 4's
  * Connect refactor made `private[sql]`. Lives under org.apache.spark.sql
  * solely to satisfy the qualified-private access — the standard pattern for
  * libraries shipping custom Catalyst expressions on Spark 4.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column -> pure catalyst Expression. `ExpressionUtils.expression`
    * returns a lazy `ColumnNodeExpression` wrapper that only standard
    * Dataset API boundaries convert — inside a custom logical operator the
    * wrapper (with its non-serializable internal AST) would survive to
    * execution. This goes through Spark's own node converter up front.
    */
  def catalystExpression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** A (possibly `.desc`/`.asc_nulls_*`) sort Column as a pure catalyst
    * SortOrder.
    */
  def sortOrder(c: Column): org.apache.spark.sql.catalyst.expressions.SortOrder = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    catalystExpression(c) match {
      case so: ce.SortOrder => so
      case e                => ce.SortOrder(e, ce.Ascending)
    }
  }

  /** Build a DataFrame from a raw LogicalPlan (custom logical operators). */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed-or-not logical plan behind a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.logical

  /** Register a function on a LIVE session (the extensions path only covers
    * session construction).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(name, info, builder)
}
