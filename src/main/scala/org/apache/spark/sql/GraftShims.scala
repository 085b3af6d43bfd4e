package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and Catalyst expressions. Spark 4
  * made `Column.expr` / `Column(expr)` sql-private (Connect split); custom
  * native expressions still need both, so this shim re-exports the two
  * conversions from inside the sql package — the standard pattern for
  * third-party Catalyst extensions. */
object GraftShims {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Wrap a custom LogicalPlan node as a DataFrame (`Dataset.ofRows` is
    * sql-private in Spark 4) — needed to offer library methods that produce
    * plans containing our own Catalyst nodes. */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (attribute-resolved, so custom
    * parent nodes can bind to its output by name). */
  def logicalPlan(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Idempotently add a planner strategy to an already-built session —
    * the path for sessions that weren't constructed `withExtensions`
    * (extensions are ignored by `getOrCreate` on an existing session). */
  def addStrategy(spark: SparkSession, s: execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s)) exp.extraStrategies = exp.extraStrategies :+ s
  }
}
