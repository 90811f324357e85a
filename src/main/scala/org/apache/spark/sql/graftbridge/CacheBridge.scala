package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Bridge into the `private[sql]` CacheManager so a caller can release
  * the QUERY-SCOPED caches an operator pinned under a plan it
  * returned. Several dedup operators cache a fingerprint/token subtree
  * that feeds multiple branches of the RETURNED (lazy) plan — they
  * cannot `try/finally unpersist` it themselves, because the cache
  * must still be live when the caller finally runs an action (an
  * in-operator unpersist would silently recompute the decode/tokenize
  * pass once per branch). The documented contract is therefore
  * caller-side cleanup: `spark.catalog.clearCache()` between sweeps
  * (as Bench does), or — surgically, without dropping unrelated
  * caches — this bridge after the result is consumed. Lives in an
  * org.apache.spark.sql subpackage solely for access; contains no
  * logic beyond the plan walk (same pattern as [[ColumnBridge]]). */
object CacheBridge {

  /** Unpersist every cache entry pinned under `df`'s analyzed plan
    * (non-cascading: caches that merely DEPEND on the plan are left
    * alone). Returns the number of entries released. Safe to call on
    * a plan with no caches (no-op, returns 0). */
  def unpersistPlanCaches(df: DataFrame): Int = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cm = cs.sharedState.cacheManager
    var released = 0
    df.queryExecution.analyzed.foreach { sub =>
      if (cm.lookupCachedData(cs, sub).isDefined) {
        cm.uncacheQuery(cs, sub, cascade = false)
        released += 1
      }
    }
    released
  }
}
