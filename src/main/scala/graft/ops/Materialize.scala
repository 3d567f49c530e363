package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Small per-family LRU of persisted frames.
  *
  * Blocked-similarity and LSH-dedup operators materialize a derived frame
  * (cell assignment, shingle sets) that several plan subtrees read. A
  * plain `persist` would leak one cache entry per distinct corpus ever
  * processed in the session; this helper bounds that to a few live
  * entries per slot (LRU, unpersist-on-evict), so a job that alternates
  * between two corpora reuses both materializations instead of thrashing
  * one slot, while a scan over many corpora still can't grow the cache
  * unboundedly. Re-caching the SAME logical plan is a hit (keyed on the
  * canonicalized plan, which is how Spark's own CacheManager matches
  * entries), which is what lets repeated searches over one corpus reuse
  * the materialized index instead of rebuilding it per call.
  *
  * The object also tracks an index **generation**: driver-side memos
  * derived from a materialized frame (per-cell radii in
  * [[Similarity]]) are valid only for the cache incarnation they were
  * computed from. The generation bumps on [[clearAll]] AND when an
  * external `spark.catalog.clearCache()` is detected (via a persisted
  * sentinel frame that such a clear unpersists) — so a rewrite-then-
  * clearCache sequence invalidates those memos even though the reading
  * plan, and therefore the memo key, is unchanged.
  */
private[graft] object Materialize {
  /** Entries kept per slot. 3 covers the alternating-corpora pattern with
    * one spare; anything larger just delays eviction of dead corpora. */
  private val maxPerSlot = 3

  // access-ordered maps: eldest entry = least recently used
  private val slots =
    new ConcurrentHashMap[String, java.util.LinkedHashMap[LogicalPlan, DataFrame]]()

  private val gen = new AtomicLong(0L)

  /** Sentinel persisted frame: still cached ⇒ no external clearCache since
    * the last generation bump. Guarded by `this`. */
  @volatile private var sentinel: DataFrame = null

  /** Current index generation — changes whenever materialized state may
    * have been dropped (explicit [[clearAll]] or an observed external
    * cache clear). Key derived driver-side memos on this. */
  def generation(spark: org.apache.spark.sql.SparkSession): Long = synchronized {
    if (sentinel == null) {
      sentinel = spark.range(1).toDF("graft_cache_sentinel")
      sentinel.persist(StorageLevel.MEMORY_ONLY)
    } else if (sentinel.storageLevel == StorageLevel.NONE) {
      // someone cleared the Spark cache out from under us: every
      // materialized frame (and anything memoized from one) is gone
      gen.incrementAndGet()
      sentinel.persist(StorageLevel.MEMORY_ONLY)
    }
    gen.get()
  }

  /** Persist `df` under the slot's LRU (or return on a plan hit without
    * re-persisting). Eviction unpersists exactly once per displaced
    * occupant: the remapping runs under the key's lock, so concurrent
    * callers serialize and a lost-race caller can never leave an orphaned
    * persisted frame behind. */
  def cachedSingleton(slot: String, df: DataFrame): DataFrame = {
    generation(df.sparkSession) // keep the sentinel (and generation) live
    val key = df.queryExecution.analyzed.canonicalized
    slots.compute(slot, (_, prev) => {
      val m =
        if (prev != null) prev
        else new java.util.LinkedHashMap[LogicalPlan, DataFrame](8, 0.75f, true)
      if (m.get(key) == null) { // miss (get also refreshes recency on hit)
        df.persist(StorageLevel.MEMORY_AND_DISK)
        m.put(key, df)
        if (m.size > maxPerSlot) {
          val it = m.entrySet().iterator()
          val eldest = it.next()
          try eldest.getValue.unpersist(blocking = false)
          catch { case _: Exception => () } // stopped session: nothing to drop
          it.remove()
        }
      } else {
        // a re-persist of the same plan after an external clearCache must
        // re-mark the entry cached (Spark dropped it; the map didn't see)
        df.persist(StorageLevel.MEMORY_AND_DISK)
      }
      m
    })
    df
  }

  /** Number of live (persisted) entries in a slot — spec observability. */
  private[graft] def liveCount(slot: String): Int = {
    val m = slots.get(slot)
    if (m == null) 0 else m.size
  }

  /** Unpersist and release every slot and bump the generation — the
    * invalidation hook for callers that rewrite data under a previously
    * indexed path (pairs with [[graft.ops.Similarity.clearIndexCaches]]). */
  def clearAll(): Unit = {
    gen.incrementAndGet()
    slots.keySet.forEach { k =>
      slots.computeIfPresent(k, (_, m) => {
        m.values.forEach { df =>
          try df.unpersist(blocking = false)
          catch { case _: Exception => () }
        }
        null
      })
    }
  }
}
