package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's unified `Column` hides its Catalyst expression behind
  * `private[sql]` converters (`org.apache.spark.sql.classic.ExpressionUtils`,
  * spark/sql/core `columnNodeSupport.scala`); extension libraries access
  * them from an `org.apache.spark.sql.*` subpackage. This is the only
  * place the project reaches into Spark internals.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
