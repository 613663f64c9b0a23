package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column <-> Expression conversions (Spark 4
  * moved Column onto ColumnNode; classic.ExpressionUtils holds the
  * converters). Standard extension-library technique — same approach
  * Spark connector libraries use to expose native expressions as
  * Columns.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
