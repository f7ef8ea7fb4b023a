package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the constructors and
  * `ExpressionUtils` private[sql]; extensions conventionally expose them
  * through a shim in an `org.apache.spark.sql` subpackage (the same
  * technique third-party connectors use). No Spark internals are
  * modified — this only re-exports two conversions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until the async listener bus has delivered all queued events.
    * `SparkContext.listenerBus` is `private[spark]`, so the accessor
    * lives here (same shim technique as the Column bridge above). Used
    * by Bench's per-query IO tally: task-end events arrive on an async
    * queue, and without a drain the last tasks of query N would be
    * charged to query N+1. A timeout degrades to slightly-fuzzy
    * attribution, never to a hang or a crash.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** The shuffle-dependency id a stage materializes, if it is a shuffle
    * map stage (`StageInfo.shuffleDepId` is `private[spark]`, so the
    * accessor lives here — same shim technique as above). Used by
    * Bench's executed-exchange counter: each distinct shuffle
    * dependency that COMPLETES a map stage is one executed Exchange,
    * with reused exchanges and skipped stages counted once — unlike
    * counting "Exchange" lines in the executed-plan string, which
    * inlines every persisted subtree's build exchanges per reference
    * (the r21 verdict's 71-vs-193 discrepancy). */
  def stageShuffleDepId(
      si: org.apache.spark.scheduler.StageInfo): Option[Int] =
    si.shuffleDepId

  /** Bounded per-group top-k collection — Spark's own `CollectTopK`
    * aggregate (a k-element BoundedPriorityQueue per group with
    * map-side partial merge), `private[aggregate]` upstream so exposed
    * through the same shim technique. `reverse = true` keeps the k
    * SMALLEST elements by the element type's natural ordering. */
  def collectTopK(child: Expression, k: Int, reverse: Boolean): Expression =
    org.apache.spark.sql.catalyst.expressions.aggregate
      .GraftTopK(child, k, reverse)
}
