package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge to Spark's `private[sql]` Column ⇄ Expression converters, so the
 * engine's native Catalyst expressions compose as ordinary `Column`s
 * without a function-registry round-trip. The standard extension-library
 * idiom (same approach as Frameless/Sedona): three delegating lines, no
 * Spark internals re-implemented.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
