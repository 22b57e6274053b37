package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** Bridge into the `org.apache.spark.sql` package namespace: building a
  * DataFrame from a custom LogicalPlan requires `Dataset.ofRows`, which
  * is private[sql]. This is the standard extension-point shim — no
  * Spark internals are modified, only re-exported. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → catalyst Expression (Spark 4 moved this behind
    * ColumnNode conversion). */
  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
