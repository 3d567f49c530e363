package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of ops/Funnel.lastTouch: last-touch attribution
  * evaluated AT CONVERSION TIME — the shape marketing attribution
  * actually runs in production (credit the click when the purchase
  * lands, not in a nightly batch). State per key is the single most
  * recent touch channel (one long + a presence flag — the entire
  * per-user memory), and each conversion row emits exactly once, in the
  * micro-batch that consumed it, credited to the touch state carried
  * across batches.
  *
  * Semantics are bit-identical to the batch window
  * (`last(touch, ignoreNulls) OVER (... ROWS ... AND 1 PRECEDING)`):
  * within a micro-batch events sort by (ts, conv-before-touch, id), so
  * a same-instant touch is INVISIBLE to the conversion (the batch
  * strictness rule), ties among touches resolve by id (last wins), and
  * a conversion with no prior touch emits the NULL/organic bucket.
  *
  * Ordering contract: identical to [[EwmaStream]]/[[ThrottleStream]] —
  * across batches the landing must deliver a key's events in
  * nondecreasing event time (a late click could re-attribute an
  * already-emitted purchase; the batch twin is the replay path when the
  * contract breaks). NoTimeout — see [[EwmaStream.streaming]]'s
  * state-retention contract (9 bytes/key, bounded key universes; an
  * event-time TTL eviction is sound here exactly like EWMA: an evicted
  * idle key restarts as organic, which is the natural attribution-window
  * semantics — production attribution expires touches anyway). */
object AttributionStream {

  final case class AEv(user_id: Long, ts_us: Long, event_id: Long,
      touch: Option[Long], conv: Option[Double])
  final case class AState(channel: Long)
  final case class AOut(user_id: Long, event_id: Long,
      channel: Option[Long], conv: Double)

  private[streaming] def attGroup(
      userId: Long, events: Iterator[AEv],
      state: GroupState[AState]): Iterator[AOut] = {
    // the batch sort key: conversions BEFORE touches at equal instants
    val sorted = events.toSeq.sortBy(e =>
      (e.ts_us, if (e.conv.isDefined) 0 else 1, e.event_id))
    var cur = state.getOption
    val out = scala.collection.mutable.ArrayBuffer.empty[AOut]
    sorted.foreach { e =>
      e.conv.foreach { v =>
        out += AOut(userId, e.event_id, cur.map(_.channel), v)
      }
      e.touch.foreach { ch => cur = Some(AState(ch)) }
    }
    cur.foreach(state.update)
    out.iterator
  }

  /** Streaming last-touch attribution over a typed event stream (ts in
    * µs; touch = channel on touch rows, conv = conversion value on
    * conversion rows, both-null rows should be pre-filtered). Update
    * mode: every conversion's credit emits in the micro-batch that
    * consumed it. */
  def streaming(events: Dataset[AEv]): Dataset[AOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        attGroup)
  }
}
