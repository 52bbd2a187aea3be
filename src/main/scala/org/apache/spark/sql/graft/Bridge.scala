package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 moved `Column` onto ColumnNode and
  * made the classic converters `private[sql]`; a one-file shim in the sql
  * package namespace is the standard third-party-extension access path
  * (same technique as other open-source Spark extension libraries — no
  * Catalyst internals are modified, only converted).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
