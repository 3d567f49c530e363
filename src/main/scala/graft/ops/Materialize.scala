package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** One-slot persist cache per operator family.
  *
  * Blocked-similarity and LSH-dedup operators materialize a derived frame
  * (cell assignment, shingle sets) that several plan subtrees read. A
  * plain `persist` would leak one cache entry per distinct corpus ever
  * processed in the session; this helper bounds that to ONE live entry
  * per slot: caching a frame whose plan differs from the slot's current
  * occupant unpersists the occupant (non-blocking — in-flight queries
  * over it just recompute). Re-caching the SAME logical plan is a no-op
  * on the cache (Spark's CacheManager keys entries by plan), which is
  * what lets repeated searches over one corpus reuse the materialized
  * index instead of rebuilding it per call.
  */
private[graft] object Materialize {
  private val slots = new ConcurrentHashMap[String, DataFrame]()

  def cachedSingleton(slot: String, df: DataFrame): DataFrame = {
    val prev = slots.put(slot, df)
    if (prev != null)
      try {
        if (!prev.queryExecution.analyzed.sameResult(df.queryExecution.analyzed))
          prev.unpersist(blocking = false)
      } catch { case _: Exception => () } // stopped session: nothing to drop
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }
}
