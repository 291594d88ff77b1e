package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the
  * replacement (`classic.ExpressionUtils`) is private[sql]. This bridge
  * lives inside the sql package namespace to re-export the two conversions
  * custom Catalyst expressions need. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER ColumnNode → Catalyst conversion. `expression` returns a lazy
    * `ColumnNodeExpression` wrapper (dataType = VOID until the analyzer's
    * own conversion rule runs) — fine in a plain projection, but an
    * expression a FunctionRegistry builder returns is embedded
    * mid-analysis, where an enclosing higher-order function type-checks
    * its arguments BEFORE that rule fires and dies on the VOID. The
    * converter emits real (if unresolved) Catalyst nodes up front.
    */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
