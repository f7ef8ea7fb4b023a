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
}
