package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of ops/TimeSeries.ewma: the per-key EWMA recurrence
  * `y_1 = x_1, y_t = (α·x_t + (100−α)·y_{t−1}) div 100` (integer 1e-6
  * units, truncating division — bit-identical arithmetic to the batch
  * fold and its recursive-CTE oracle) evaluated INCREMENTALLY over an
  * unbounded stream with flatMapGroupsWithState: state per key is ONE
  * long (the last y), each event emits its smoothed value exactly once.
  *
  * Ordering contract: a recurrence consumes its input in (ts, id) order.
  * WITHIN a micro-batch the group function sorts explicitly (state
  * functions see an unordered iterator); ACROSS micro-batches the
  * landing layout must deliver a key's events in nondecreasing event
  * time — the time-ordered file staging every recurrent consumer
  * requires (an out-of-order event cannot be merged into a fold whose
  * later outputs it would change; contrast [[Sessionize]], whose min/max
  * state absorbs late events). The batch twin is the replay path when
  * that contract breaks: recompute the affected window with
  * `TimeSeries.ewma` / `.ewmaSegmented`.
  *
  * Scale shape: one keyed state exchange per micro-batch; state size =
  * |active keys| × 16 bytes — the smallest possible recurrent state
  * (compare sessionization's 4-field extent). */
object EwmaStream {

  final case class VEv(user_id: Long, ts_us: Long, event_id: Long, xu: Long)
  final case class YState(y: Long)
  final case class YOut(user_id: Long, event_id: Long, ewma_units: Long)

  private[streaming] def ewmaGroup(alphaNum: Long)(
      userId: Long, events: Iterator[VEv],
      state: GroupState[YState]): Iterator[YOut] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var cur = state.getOption
    val out = sorted.map { e =>
      val y = cur match {
        case Some(s) => (alphaNum * e.xu + (100L - alphaNum) * s.y) / 100L
        case None => e.xu
      }
      cur = Some(YState(y))
      YOut(userId, e.event_id, y)
    }
    cur.foreach(state.update)
    out.iterator
  }

  /** Streaming EWMA over a typed event stream (ts in µs, value already
    * in integer units). Update mode: each event's smoothed value emits
    * in the micro-batch that consumed it.
    *
    * STATE-RETENTION CONTRACT: `NoTimeout` — per-key state is a single
    * long (the smallest possible recurrent state), but keys NEVER
    * expire: over an unbounded key space (user ids grow forever) the
    * state store grows monotonically at 16 bytes/key. That is the
    * correct default for a bounded key universe (devices, symbols,
    * tenants); a production run over unbounded keys wants
    * [[streamingWithTtl]], which evicts idle keys on an event-time
    * timeout (the [[Sessionize.streamingClosed]] pattern). */
  def streaming(events: Dataset[VEv], alphaNum: Int): Dataset[YOut] = {
    require(alphaNum > 0 && alphaNum < 100, "alphaNum is a percentage")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        ewmaGroup(alphaNum.toLong))
  }

  private[streaming] def ewmaGroupTtl(alphaNum: Long, ttlMs: Long)(
      userId: Long, events: Iterator[VEv],
      state: GroupState[YState]): Iterator[YOut] = {
    if (state.hasTimedOut) {
      // idle past the TTL: drop the 16-byte state; the key's next event
      // restarts the recurrence (y = x), exactly the fresh-key branch
      state.remove()
      Iterator.empty
    } else {
      val evs = events.toSeq
      val out = ewmaGroup(alphaNum)(userId, evs.iterator, state)
      if (state.exists && evs.nonEmpty) {
        // evict when event time passes last-seen + ttl; the max() guard
        // keeps the timestamp legal for keys already older than the
        // watermark (Spark rejects timeouts at/behind it)
        val lastMs = evs.map(_.ts_us).max / 1000L
        state.setTimeoutTimestamp(
          math.max(lastMs + ttlMs, state.getCurrentWatermarkMs() + 1))
      }
      out
    }
  }

  /** [[streaming]] with BOUNDED state for unbounded key spaces: a key
    * idle for `ttlMinutes` of event time (measured from the stream's
    * watermark) has its state evicted, so the store holds only
    * recently-active keys. Semantics of eviction are explicit and
    * documented: the evicted key's NEXT event restarts the recurrence
    * at `y = x` — after `ttl` of silence the stale state's weight
    * `(1−α)^n` is negligible anyway, which is what makes a TTL sound
    * for EWMA where it would be lossy for a sum. Keys that stay live
    * (events within every TTL window) emit values BIT-IDENTICAL to
    * [[streaming]] (spec-asserted). Requires a watermark on the source
    * (the EventTimeTimeout contract, as [[Sessionize.streamingClosed]]). */
  def streamingWithTtl(events: Dataset[VEv], alphaNum: Int,
      ttlMinutes: Int): Dataset[YOut] = {
    require(alphaNum > 0 && alphaNum < 100, "alphaNum is a percentage")
    require(ttlMinutes >= 1, "ttlMinutes must be positive")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(
        ewmaGroupTtl(alphaNum.toLong, ttlMinutes * 60000L))
  }
}
