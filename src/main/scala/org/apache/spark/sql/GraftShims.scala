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
}
