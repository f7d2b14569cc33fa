package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column↔Expression factories (Spark 4 moved
  * `Column` to a node-based API; libraries adding custom Catalyst
  * expressions use exactly this shim pattern). */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The materialized RDD behind an eagerly `localCheckpoint`ed Dataset.
    * Checkpoint persistence is RDD-level (it bypasses the CacheManager, so
    * `spark.catalog.clearCache()` never releases it); deterministic cleanup
    * needs the underlying RDD to `unpersist` directly. */
  def checkpointedRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
}
