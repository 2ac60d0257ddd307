package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]` bridge: build a [[Column]] from a Catalyst
  * [[Expression]] (and back) without going through the session function
  * registry. Spark 4 hid the classic `Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`; libraries that ship
  * native expressions (here: `graft.functions.ArrayDotExpr` used inside
  * `SimOps.semDedup`) conventionally expose it via a package bridge like
  * this rather than forcing every caller to pre-register SQL functions.
  * Nothing else from the private API is touched.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
