package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's programmatically-constructed Catalyst expressions
  * and the public Column API.
  *
  * Spark 4's Column wraps a ColumnNode, and the Expression<->Column
  * converters (`ExpressionUtils.column`/`.expression`) are `private[sql]` —
  * fine for expressions that reach the analyzer through the function
  * registry (graft.plans.GraftExtensions), but graft.plans.RelationsGenExpr
  * must carry non-Expression state (a Broadcast model + accumulators) that
  * cannot ride through `call_function` arguments, so it is constructed
  * directly and needs this one-hop bridge. Registering per-call uniquely
  * named builder closures instead would leak registry entries and race two
  * models registered under one name in the same session (the test suites do
  * exactly that). This package-placement idiom is the standard Spark
  * extension-library escape hatch; nothing else in graft lives outside the
  * graft namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
