package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x removed the public `new Column(expr)` constructor; the classic
  * bridge lives in `private[sql] org.apache.spark.sql.classic`. This shim is
  * the single place we cross that boundary so the rest of the engine stays on
  * public API (expressions are also SQL-registered via SparkSessionExtensions,
  * see graft.functions.GraftExtensions).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until all queued listener-bus events are delivered (the bus is
    * `private[spark]`) — lets benchmarks read SparkListener aggregates
    * immediately after an action completes.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
