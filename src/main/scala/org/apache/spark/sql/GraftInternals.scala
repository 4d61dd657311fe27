package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark's `private[sql]` Column↔Expression converters — the
 * standard pattern public Spark extension libraries use (cf. the
 * package-placement in SNIPPETS.md [1]/[3]) to wrap custom Catalyst
 * expressions as user-facing Columns on Spark 4's split Column API.
 */
object GraftInternals {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
