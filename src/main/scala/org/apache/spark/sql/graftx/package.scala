package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column constructor so graft's
  * native Catalyst expressions can be exposed as ordinary [[Column]]s.
  * Lives under `org.apache.spark.sql` purely for access; contains no
  * logic.
  */
package object graftx {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
