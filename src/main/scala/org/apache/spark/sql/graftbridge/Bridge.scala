package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the `private[sql]` Expression <-> Column bridge —
  * the standard pattern for Spark-extension libraries that define custom
  * Catalyst expressions (the public Column API intentionally hides the
  * classic backend's expression plumbing in Spark 4). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
