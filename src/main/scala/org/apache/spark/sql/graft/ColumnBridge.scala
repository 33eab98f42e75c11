package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the engine's native Catalyst
  * expressions. Spark 4 wraps Columns around ColumnNodes and keeps the
  * conversion utilities `private[sql]`; a library shipping custom
  * expressions hosts this two-liner inside the sql package namespace —
  * the standard pattern for Spark-native extension libraries. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True when no Dataset-level persist is registered — the probe behind
    * the "operators release their caches" tests (CacheManager is
    * `private[sql]`, hence lives here in the bridge). */
  def cacheManagerIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
