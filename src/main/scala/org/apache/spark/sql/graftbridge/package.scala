package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made the classic converters
  * `private[sql]`, so third-party Catalyst expressions need this minimal
  * shim inside the sql package to surface as user-facing Columns (the
  * same technique Spark-ecosystem libraries use; no internals are
  * modified, only re-exported).
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
