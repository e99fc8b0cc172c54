package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to build a
  * Column from a custom Catalyst expression that cannot go through the
  * FunctionRegistry — [[graft.functions.LmScore]] carries a Broadcast
  * handle in its constructor, and registry functions are constructed
  * from (name, children) alone. The standard sub-package technique:
  * `private[sql]` members are visible from any `org.apache.spark.sql`
  * subpackage; this object re-exports the two conversions and nothing
  * else. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
