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

  /** The frame without its top-level global Sort, if any (else the
    * frame unchanged). Bench uses this to time the operator rather than
    * the deterministic-output wrapper: a global `orderBy` adds a
    * RangePartitioning exchange whose bounds-sampling pass executes the
    * child an EXTRA time, roughly doubling the measured cost of every
    * expensive projection (VERDICT r5 #6). Verify keeps the sort — the
    * driver's row-hash comparison needs deterministic row order.
    * (`classic.Dataset.ofRows` is `private[sql]`, hence the bridge.) */
  def withoutTopLevelSort(df: Dataset[Row]): Dataset[Row] =
    df.queryExecution.analyzed match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global =>
        classic.Dataset.ofRows(
          df.sparkSession.asInstanceOf[classic.SparkSession], s.child)
      case _ => df
    }
}
