// Package gateway: Column <-> catalyst Expression converters are
// private[sql] in Spark 4.x, so third-party native expressions need a
// one-file bridge compiled into the org.apache.spark.sql package — the
// standard pattern used by OSS Spark extension libraries.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
