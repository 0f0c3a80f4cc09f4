package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Tiny bridge into Spark's `private[sql]` Column/Expression converters —
 * the standard pattern for Spark extension libraries that ship custom
 * Catalyst expressions (compiled into the org.apache.spark.sql package to
 * gain access; no Spark internals are modified).
 */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
