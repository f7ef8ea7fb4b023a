package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shim for Spark's `CollectTopK`, which is `private[aggregate]`
  * upstream — the same re-export technique as
  * [[org.apache.spark.sql.graftbridge.Bridge]] (no Spark internals are
  * modified; this only re-exports one constructor).
  *
  * CollectTopK is a k-element BoundedPriorityQueue per group with
  * map-side partial merge — the bounded-memory alternative to a rank
  * window whose per-partition sort materializes the whole candidate
  * stream (SCALE.md r18: that sort exhausted the box's disk at
  * ~1.56e10 kNN candidates). `reverse = true` keeps the k SMALLEST
  * elements by the element type's natural ordering; output array order
  * is unspecified (callers sort).
  */
object GraftTopK {
  def apply(child: Expression, k: Int, reverse: Boolean): Expression =
    CollectTopK(child, k, reverse).toAggregateExpression()
}
