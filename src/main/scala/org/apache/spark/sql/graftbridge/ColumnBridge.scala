package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` ↔ catalyst `Expression` conversion
  * `private[sql]` (columns are backed by ColumnNodes in sql-api).
  * This tiny bridge lives inside the `org.apache.spark.sql` package
  * namespace solely to re-export the two conversions our custom
  * expressions (graft.plans) need. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
