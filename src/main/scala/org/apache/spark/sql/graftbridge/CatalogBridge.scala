package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** Bridge into `private[sql]` session-catalog plumbing (the ColumnBridge
  * pattern): the SessionCatalog caches each catalog table's resolved V1
  * relation (file list pinned at resolution time), and the PUBLIC
  * refresh APIs are name-keyed — `refreshByPath` only touches the
  * dataset-persistence cache. A path-addressed writer (the TxLog
  * InsertableRelation seam, which knows the table DIRECTORY but not
  * which catalog names point at it) therefore needs the catalog-wide
  * invalidation `SessionCatalog.invalidateAllCachedTables` so a SELECT
  * right after an INSERT serves the new version. Relation caches rebuild
  * lazily at metadata cost — correct-but-recached beats stale.
  */
object CatalogBridge {

  /** Evict every cached table relation in the session's catalog. */
  def invalidateCachedRelations(spark: SparkSession): Unit =
    spark.sessionState.catalog.invalidateAllCachedTables()
}
