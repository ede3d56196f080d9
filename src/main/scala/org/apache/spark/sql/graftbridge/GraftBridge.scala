package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column ↔ Expression conversion — the standard
  * technique for Spark extension libraries (Delta, Frameless, Sedona all ship
  * an org.apache.spark.sql.* shim) since Spark 4 made ExpressionUtils
  * sql-private. No Spark internals are modified; this only re-exports two
  * conversions for graft.functions.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
