package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` / `col.expr` bridge
  * (Columns wrap ColumnNodes since the Connect refactor); the classic
  * conversion lives in `private[sql] ExpressionUtils`. This shim —
  * placed under the org.apache.spark.sql package solely for access —
  * re-exports the two conversions our custom Catalyst expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` went `private[sql]` in Spark 4; aggregates
    * outside the package still need it to declare `inputTypes`.
    */
  type InputType = org.apache.spark.sql.types.AbstractDataType
}
