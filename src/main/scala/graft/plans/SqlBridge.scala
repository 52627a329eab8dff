package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made Column a backend-agnostic wrapper; the classic
  * Column↔Expression converters are private[sql]. This two-line bridge
  * (compiled into an org.apache.spark.sql subpackage, the standard
  * extension-library technique) exposes them to graft's native
  * expressions. No Spark internals are modified.
  */
object SqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
