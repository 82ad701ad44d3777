package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's `private[sql]` Column↔Expression converters (the
 * Spark 4 Column API wraps ColumnNodes, not Expressions). Living under the
 * `org.apache.spark.sql` package namespace is the established pattern for
 * Spark-native extension libraries that ship custom Catalyst expressions
 * behind a public Column API.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
