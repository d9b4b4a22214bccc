package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for Spark 4's column-node API.
  * `ExpressionUtils` is private[sql], so this lives under the
  * org.apache.spark.sql package — the established pattern for libraries
  * that define custom Catalyst expressions (cf. Spark's own
  * `package object sql` exposing Strategy, and third-party engines that
  * publish `org.apache.spark.sql.*` shims).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
