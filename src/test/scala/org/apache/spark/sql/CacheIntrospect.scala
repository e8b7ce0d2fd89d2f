package org.apache.spark.sql

/** Test-only bridge into the session's CacheManager (private[sql]): lets
  * specs assert that library operators do not leave cached plans behind
  * for the session's lifetime. */
object CacheIntrospect {
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
