package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridges `graft.plans` Catalyst expressions into the public `Column`
  * API. Spark 4.x hides `Column(expr)` behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this shim lives in a
  * subpackage of `org.apache.spark.sql` solely to re-export the two
  * conversions — the standard technique for libraries shipping custom
  * expressions without a session-level function registry.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
