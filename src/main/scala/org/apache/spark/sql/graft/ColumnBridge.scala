package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Public bridge over the `private[sql]` Column ↔ Expression converters.
  *
  * `ExpressionUtils` is package-private to `org.apache.spark.sql`, so code
  * in the `graft.*` packages (e.g. the SQL function builders) can't reach
  * it directly. This object lives inside the sql package tree — the same
  * placement trick Spark extensions commonly use — and re-exports the two
  * converters the library needs.
  *
  * `toExpr` converts EAGERLY via the default
  * [[ColumnNodeToExpressionConverter]] rather than wrapping in a lazy
  * `ColumnNodeExpression` (what `ExpressionUtils.expression` does): a
  * function-registry builder must return a plain unresolved Catalyst tree
  * for the analyzer to resolve — a deferred column-node wrapper survives
  * analysis unconverted and fails at codegen with INTERNAL_ERROR.
  *
  * Scope note: the default converter resolves its parser/SQLConf from the
  * ACTIVE session (bare `SparkSqlParser` fallback when none). `toExpr` is
  * therefore intended for ANALYSIS-TIME use — function-registry builders
  * run by the analyzer, where the active session is the right one by
  * construction. Calling it with no active session, or under another
  * extension that installs a custom converter for its own column nodes,
  * bypasses that converter — don't use it as a general-purpose eager
  * Column unwrapper outside the builder path.
  */
object ColumnBridge {
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}
