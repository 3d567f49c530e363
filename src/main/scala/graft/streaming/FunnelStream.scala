package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of ops/Funnel: the per-user ordered-step stage fold
  * (`stage` advances when the NEXT required event type arrives strictly
  * after the last matched event's time) evaluated INCREMENTALLY with
  * flatMapGroupsWithState — the live conversion dashboard over an
  * unbounded clickstream. State per user is O(1) and the SMALLEST the
  * semantics admit: (stage, ts of last matched event) — 12 bytes —
  * identical to the batch fold's accumulator, so chaining micro-batches
  * through it is provably the same fold (spec-asserted bit-equal).
  *
  * Emission contract (Update mode): a user emits a row ONLY in a
  * micro-batch where their stage ADVANCED — emissions per user are
  * monotone in stage, so the sink snapshot's per-user MAX(stage) is the
  * current funnel position, and `Funnel.reachFromStages` turns that
  * snapshot into the same report the batch operator produces. Events
  * that don't advance the funnel update nothing and emit nothing —
  * the common case costs zero sink traffic.
  *
  * Ordering contract: as [[EwmaStream]] — within a micro-batch the
  * group fn sorts by (ts, id); across micro-batches the landing must
  * deliver a key's events in nondecreasing event time (a late event
  * cannot un-advance a stage fold). The batch operator is the replay
  * path when that contract breaks.
  *
  * Scale shape: one keyed state exchange per micro-batch; state =
  * |users seen| × 12 bytes. Keys never expire under NoTimeout — the
  * funnel-analysis window is usually bounded by a campaign/cohort
  * horizon; over a truly unbounded user space apply the
  * [[EwmaStream.streamingWithTtl]] EventTimeTimeout pattern (an evicted
  * user restarts at stage 0, which UNDERSTATES conversion — eviction is
  * only sound past the funnel's completion horizon). */
object FunnelStream {

  final case class FEv(user_id: Long, ts_us: Long, event_id: Long, et: String)
  final case class FState(stage: Int, last: Long)
  final case class FOut(user_id: Long, stage: Int)

  private[streaming] def funnelGroup(steps: IndexedSeq[String])(
      userId: Long, events: Iterator[FEv],
      state: GroupState[FState]): Iterator[FOut] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var st = state.getOption.getOrElse(FState(0, Long.MinValue))
    val before = st.stage
    sorted.foreach { e =>
      if (st.stage < steps.size && e.et == steps(st.stage) && e.ts_us > st.last)
        st = FState(st.stage + 1, e.ts_us)
    }
    if (st.stage > before) {
      state.update(st)
      Iterator.single(FOut(userId, st.stage))
    } else Iterator.empty
  }

  /** Streaming funnel positions over a typed event stream (ts in µs).
    * Update mode; see the emission contract above. */
  def streaming(events: Dataset[FEv], steps: Seq[String]): Dataset[FOut] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "repeated step types are ambiguous — encode repeats as distinct types")
    import events.sparkSession.implicits._
    val idx = steps.toIndexedSeq
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        funnelGroup(idx))
  }
}
