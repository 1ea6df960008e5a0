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

  /** `Dataset.ofRows` forwarder (private[sql] in Spark 4) — turn an
    * already-analyzed logical plan back into a DataFrame (the SQL DML
    * commands execute the statement's resolved source/query plans). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `SparkSession.internalCreateDataFrame` forwarder — the only public
    * path to a DataFrame whose logical plan carries `isStreaming=true`,
    * which a DSv1 streaming `Source.getBatch` MUST return (the
    * micro-batch executor asserts it). Same pattern as above: a
    * re-export, no Spark internals modified. */
  def internalDf(spark: org.apache.spark.sql.SparkSession,
                 rdd: org.apache.spark.rdd.RDD[
                   org.apache.spark.sql.catalyst.InternalRow],
                 schema: org.apache.spark.sql.types.StructType,
                 isStreaming: Boolean): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming)
}
