package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's Column ↔ catalyst Expression conversion, which
  * is `private[sql]` (`classic.ExpressionUtils`). Needed to expose
  * custom Catalyst expressions (e.g. the FM-sketch aggregate) as
  * user-facing `Column`s.
  */
object GraftColumnBridge {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
