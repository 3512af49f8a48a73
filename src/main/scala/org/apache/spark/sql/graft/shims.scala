/*
 * Thin accessor for Spark's private[sql] Column↔Expression bridge —
 * the standard pattern for Spark-native extension libraries (the
 * published Column/Dataset factory shims use the same package-placement
 * technique). Nothing else in this file; all engine code lives in the
 * graft.* packages.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
