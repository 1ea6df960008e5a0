package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge. `ExpressionUtils` is `private[sql]` in
 * Spark 4, so the (standard extension-library) workaround is a forwarder
 * compiled into an `org.apache.spark.sql` subpackage. No Spark internals are
 * modified — this only re-exports two conversions.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
