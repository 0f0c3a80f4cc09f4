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

  /** True session clone (shared context, COPIED SessionState incl. the
    * runtime SQLConf) — unlike `newSession()`, runtime `conf.set`s the
    * user made (rebase modes, session timezone, case sensitivity…) carry
    * over, so a job on the clone reads data under the same semantics as
    * the parent. `cloneSession` is `private[sql]`; this package is. */
  def cloneSession(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}
