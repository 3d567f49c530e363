package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming change-point monitor — q146's live twin against a PINNED
  * reference (the q128 drift-monitor pattern): with reference moments
  * (Σu_ref, n_ref) frozen per key at deploy time, the running statistic
  *   C_k · n_ref = n_ref·S_k − k·Σu_ref
  * (S_k the running unit sum, k the running count — all integer, the
  * q146 scaling argument with the reference playing the whole-series
  * mean) peaks in magnitude at a level shift away from the reference
  * regime. State per key is (k, S, best |C·n_ref| so far) — 24 bytes;
  * a row EMITS only when it strictly improves the peak (monotone
  * emissions, zero sink traffic in steady state), so the sink
  * snapshot's per-key max IS the current change-point estimate and
  * hash-checks against the batch windowed replay (batch-equivalence,
  * the q114/q124 pattern). Strictly-improving emission preserves the
  * batch tie rule for free: arrival is event-time-ordered, so the
  * FIRST row reaching a given magnitude is the earliest (ts, id).
  *
  * Ordering contract: identical to [[EwmaStream]] — in-batch sort,
  * cross-batch nondecreasing event time per key. */
object CusumStream {

  final case class MEv(event_type: String, ts_us: Long, event_id: Long, u: Long)
  final case class MState(k: Long, s: Long, bestAbs: Long)
  final case class MOut(event_type: String, event_id: Long, cusum_xnref: Long)

  private[streaming] def monitorGroup(refs: Map[String, (Long, Long)])(
      key: String, events: Iterator[MEv],
      state: GroupState[MState]): Iterator[MOut] = {
    val (sumRef, nRef) = refs.getOrElse(key, (0L, 0L))
    if (nRef == 0L) return Iterator.empty // unreferenced key: no regime to drift from
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var st = state.getOption.getOrElse(MState(0L, 0L, -1L))
    val out = Seq.newBuilder[MOut]
    sorted.foreach { e =>
      val k = st.k + 1
      val s = st.s + e.u
      val c = math.abs(nRef * s - k * sumRef)
      if (c > st.bestAbs) out += MOut(key, e.event_id, c)
      st = MState(k, s, math.max(c, st.bestAbs))
    }
    state.update(st)
    out.result().iterator
  }

  /** Streaming CUSUM monitor over a typed event stream (u already in
    * integer units); `refs` maps each key to its pinned (Σu_ref,
    * n_ref). Update mode; NoTimeout (24 bytes/key — see
    * [[EwmaStream.streaming]]'s retention contract). */
  def streaming(events: Dataset[MEv],
      refs: Map[String, (Long, Long)]): Dataset[MOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        monitorGroup(refs))
  }
}
