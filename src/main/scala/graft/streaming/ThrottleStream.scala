package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of ops/TimeSeries.throttle: the greedy debounce
  * recurrence (keep an event iff ≥ gap µs since the last KEPT event of
  * the key — a dropped event must NOT reset the clock) evaluated
  * incrementally with flatMapGroupsWithState. State per key is ONE long
  * (the last kept timestamp — exactly the batch kernel's accumulator,
  * so the streamed verdicts are bit-identical to
  * [[graft.ops.TimeSeries.throttle]] and hash-check against q154's
  * recursive-CTE oracle by batch-equivalence).
  *
  * Ordering contract: identical to [[EwmaStream]] — within a
  * micro-batch the group function sorts by (ts, id); across batches the
  * landing must deliver a key's events in nondecreasing event time (a
  * late event could flip verdicts already emitted; the batch twin is
  * the replay path when the contract breaks).
  *
  * This is the live shape of the op's actual use: alert dedup and
  * notification caps are enforced AT DELIVERY TIME, not in a nightly
  * batch — the sink consumes only kept=true rows, and the 8-byte state
  * is the entire per-key memory. */
object ThrottleStream {

  final case class TEv(user_id: Long, ts_us: Long, event_id: Long)
  final case class TState(lastKept: Long)
  final case class TOut(user_id: Long, event_id: Long, kept: Boolean)

  private[streaming] def throttleGroup(gapUs: Long)(
      userId: Long, events: Iterator[TEv],
      state: GroupState[TState]): Iterator[TOut] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var cur = state.getOption
    val out = sorted.map { e =>
      val kept = cur match {
        case Some(s) => e.ts_us - s.lastKept >= gapUs
        case None => true
      }
      if (kept) cur = Some(TState(e.ts_us))
      TOut(userId, e.event_id, kept)
    }
    cur.foreach(state.update)
    out.iterator
  }

  /** Streaming throttle over a typed event stream (ts in µs). Update
    * mode: every event's verdict emits in the micro-batch that consumed
    * it. NoTimeout — see [[EwmaStream.streaming]]'s state-retention
    * contract (8 bytes/key, bounded key universes; add an event-time
    * TTL for unbounded key spaces, the eviction restarting the chain
    * like a fresh key — sound here for the same reason as EWMA: after
    * a long silence the next event is kept either way whenever the
    * silence exceeds the gap). */
  def streaming(events: Dataset[TEv], gapMs: Long): Dataset[TOut] = {
    require(gapMs > 0, "gap must be positive")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        throttleGroup(gapMs * 1000L))
  }
}
