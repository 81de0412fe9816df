package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column ↔ Expression converters.
  *
  * Spark 4 moved `Column` to the connect-compatible sql-api module; the
  * classic converters (`ExpressionUtils.column/expression`) became
  * `private[sql]`. Operators that attach RAW catalyst expressions — the
  * Bloom-filter scalar subquery in `Dedup.contaminatedDocsBloom` is the one
  * user today — need exactly these two calls and nothing else, so this
  * object re-exports them from a package that is allowed to see them
  * (the same move every extension library makes; everything referenced is
  * public Spark source). Functions registered through
  * `GraftExtensions`/`call_function` do NOT need this bridge — it exists
  * only for expressions that cannot be expressed as a registry call, e.g.
  * a `ScalarSubquery` argument.
  */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
