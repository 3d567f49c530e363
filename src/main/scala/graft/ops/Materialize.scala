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

  /** Swap-and-persist atomically per slot: `compute` runs the remapping
    * under the key's lock, so concurrent callers serialize and every
    * displaced occupant is unpersisted exactly once — a lost-race caller
    * can never leave an orphaned persisted frame behind. */
  def cachedSingleton(slot: String, df: DataFrame): DataFrame = {
    slots.compute(slot, (_, prev) => {
      if (prev != null)
        try {
          if (!prev.queryExecution.analyzed.sameResult(df.queryExecution.analyzed))
            prev.unpersist(blocking = false)
        } catch { case _: Exception => () } // stopped session: nothing to drop
      df.persist(StorageLevel.MEMORY_AND_DISK)
      df
    })
    df
  }

  /** Unpersist and release every slot — the invalidation hook for callers
    * that rewrite data under a previously indexed path (pairs with
    * [[graft.ops.Similarity.clearIndexCaches]]). */
  def clearAll(): Unit =
    slots.keySet.forEach { k =>
      slots.computeIfPresent(k, (_, prev) => {
        try prev.unpersist(blocking = false)
        catch { case _: Exception => () }
        null
      })
    }
}
