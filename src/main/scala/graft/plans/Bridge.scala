package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessors for `Dataset.ofRows` and the Column→Expression
  * converter (both `private[sql]` in Spark 4's classic implementation)
  * — the standard bridge pattern Spark extension libraries use to wrap
  * a custom LogicalPlan in a public DataFrame. Nothing else from the
  * private surface is touched. */
object GraftSqlBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  def expressionOf(c: org.apache.spark.sql.Column): Expression =
    ColumnConversions.expression(c)
}
