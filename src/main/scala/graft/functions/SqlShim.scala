// Package gateway: Column <-> catalyst Expression converters are
// private[sql] in Spark 4.x, so third-party native expressions need a
// one-file bridge compiled into the org.apache.spark.sql package — the
// standard pattern used by OSS Spark extension libraries.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap an analyzed LogicalPlan subtree back into a DataFrame —
    * `Dataset.ofRows` is private[sql]. Used by PlanGuardSpec to execute
    * a Window node's CHILD in isolation (row count + partition-key NDV)
    * for the low-cardinality-key skew guard. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
