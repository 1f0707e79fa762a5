package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression interop for custom Catalyst expressions. Spark 4
  * moved Column onto ColumnNode and made the converters private[sql];
  * this bridge lives under the sql package purely to re-expose the two
  * conversions to the graft library. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Decompose a `col.desc`/`col.asc`-wrapped Column into (bare value
    * column, isDescending). A plain value column returns itself with
    * ascending. Works on the ColumnNode layer — `expression()` wraps
    * nodes in a lazy ColumnNodeExpression, so catalyst-side SortOrder
    * matching never fires pre-resolution. */
  def sortOrder(c: Column): (Column, Boolean) = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder =>
      (new Column(so.child),
        so.sortDirection == org.apache.spark.sql.internal.SortOrder.Descending)
    case _ => (c, false)
  }
}
