package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression
  * converters and DataFrame constructor (the classic, non-Connect path).
  * Lives in the `org.apache.spark.sql` namespace for access — the
  * standard technique for Spark extension libraries that define native
  * Catalyst expressions / logical plans with a typed Column API.
  * Nothing else from the internals is used. */
package object graftshim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (custom) logical plan as a DataFrame on a classic session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** True when the session's SQL cache holds no entries — the
    * cache-hygiene gate (`CacheHygieneSpec`): library operators must
    * not leave `persist()`ed frames behind for callers that never
    * `clearCache()`. */
  def sqlCacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
