package org.apache.spark.sql.graftglue

import org.apache.spark.sql.SparkSession

/** Test-only bridge into the `private[sql]` CacheManager, used to assert
  * that operators which pin intermediate frames (localCheckpoint) leave
  * NO CacheManager registration behind — the persist-without-unpersist
  * leak class found in round 2/3 (dedupIncremental, contaminated,
  * searchIvfIndex). Lives under org.apache.spark.sql solely for access
  * scope; no Spark behavior is modified.
  */
object testglue {
  private def classic(spark: SparkSession) =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** True iff the session's CacheManager holds no cached plan. */
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    classic(spark).sharedState.cacheManager.isEmpty
}
