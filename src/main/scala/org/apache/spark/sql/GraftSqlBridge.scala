package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made the conversion helpers
  * (`classic.ExpressionUtils`) private[sql]; third-party engines that
  * ship native Catalyst expressions (Sedona, Delta, …) bridge from
  * inside the package — the bytecode is public and stable. This is the
  * only file outside the graft namespace.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
