package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into the `private[sql]` Column <-> Expression conversions, so
 * graft's native Catalyst expressions (e.g. graft.functions.DotProduct)
 * can be used as Columns without registering session extensions — the
 * standard technique for Spark extension libraries that ship custom
 * expressions (Spark 4 removed the public Column(Expression)
 * constructor in the Connect refactor).
 */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Non-blocking observation read (`Observation.getOrEmpty` is
    * `private[spark]`; the public `get` blocks forever on a frame that
    * never executed). */
  def observationGetOrEmpty(o: Observation): Map[String, Any] = o.getOrEmpty
}
