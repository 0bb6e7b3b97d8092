package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The single place this library touches a Spark-internal API.
  *
  * Spark 4 made `Column` backend-agnostic (Spark Connect); the classic
  * Expression↔Column converters (`org.apache.spark.sql.classic.
  * ExpressionUtils`) became `private[sql]`. Wrapping custom Catalyst
  * expressions as Columns therefore needs this shim placed inside the
  * `org.apache.spark.sql` namespace — the established pattern used by
  * Catalyst-extension libraries. Everything else in the engine lives in
  * `graft.*` and uses only public Spark API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
