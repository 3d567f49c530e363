package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based activity sessionization, in both execution models:
  *
  *  - `batch`: the declarative window formulation (lag → gap flag →
  *    running session index → group) — one shuffle on user, fully
  *    Catalyst-optimized; this is also the correctness oracle.
  *  - `streaming`: the same semantics as arbitrary keyed state via
  *    flatMapGroupsWithState (Update mode) — the scale path when events
  *    arrive as an unbounded stream and sessions must close incrementally.
  *    Emitted rows are session *snapshots*; collapse with
  *    `latestSnapshot` to get each session's final extent.
  *
  * All gap arithmetic is in epoch microseconds (the table's native
  * precision after the ns→µs floor) on both paths, so streaming, batch,
  * and the DuckDB oracle agree exactly.
  */
object Sessionize {

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long)

  /** Event with its TIMESTAMP column intact — [[streamingClosed]] needs
    * the watermarked attribute to reach the stateful operator (Spark's
    * event-time-timeout contract), so the µs conversion happens inside
    * the state function instead of a projection that would drop it. */
  final case class EvT(user_id: Long, ts: Timestamp, event_id: Long)

  private def microsOf(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** `sessId` is the event_id of the event that OPENED the session — the
    * session's stable identity. A late event may widen `start` between
    * snapshots, so (user, start) is NOT stable; snapshots of one session
    * always share `sessId`, which is what [[latestSnapshot]] collapses on.
    *
    * STATE-SCHEMA BREAK (pre-1.0): adding `sessId`/`sess_id` changed both
    * the flatMapGroupsWithState state encoder and the output schema — a
    * streaming checkpoint written before this field existed fails (or
    * misdecodes) on restart, and `latestSnapshot` requires the `sess_id`
    * column pre-change snapshot data lacks. Deployments upgrading across
    * this change must start from a NEW checkpoint location (and re-derive
    * snapshots), not resume the old one. */
  final case class SessionState(start: Long, end: Long, n: Long, sessId: Long)
  final case class SessionOut(user_id: Long, sess_id: Long,
      session_start: Timestamp, session_end: Timestamp, n: Long)

  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Batch twin: session = maximal run of events with gaps <= gapMinutes. */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    val gapped = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    gapped.groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n"))
      .drop("sid")
      .orderBy("user_id", "session_start")
  }

  private[streaming] def sessionizeGroup(gapUs: Long)(
      userId: Long, events: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    // state funcs see an unordered batch: order explicitly
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    val out = Seq.newBuilder[SessionOut]
    var cur = state.getOption
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts_us - s.end <= gapUs =>
          // min/max, not assignment: a late event from a previous
          // micro-batch may fall inside the stored session, and moving
          // `end` backwards would later split a session the batch twin
          // (and oracle) keep whole
          cur = Some(s.copy(start = math.min(s.start, e.ts_us),
            end = math.max(s.end, e.ts_us), n = s.n + 1))
        case Some(s) => // close previous, open new
          out += SessionOut(userId, s.sessId, tsFromMicros(s.start), tsFromMicros(s.end), s.n)
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.event_id))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.event_id))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // snapshot of the (possibly still-open) session
      out += SessionOut(userId, s.sessId, tsFromMicros(s.start), tsFromMicros(s.end), s.n)
    }
    out.result().iterator
  }

  /** Streaming sessionization over a typed event stream (ts in µs). */
  def streaming(events: Dataset[Ev], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        sessionizeGroup(gapMinutes * 60L * 1000000L))
  }

  /** Closed-session transition function: same merge semantics as
    * [[sessionizeGroup]], but rows are emitted only when a session is
    * KNOWN complete — either a newer event broke the gap, or the event-
    * time watermark passed session_end + gap (the timeout branch). State
    * for a closed session is removed, so state size is bounded by the
    * number of concurrently-open sessions regardless of stream length. */
  private[streaming] def sessionizeClosedGroup(gapUs: Long)(
      userId: Long, events: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(
        SessionOut(userId, s.sessId, tsFromMicros(s.start), tsFromMicros(s.end), s.n))
    } else {
      val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val out = Seq.newBuilder[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts_us - s.end <= gapUs =>
            cur = Some(s.copy(start = math.min(s.start, e.ts_us),
              end = math.max(s.end, e.ts_us), n = s.n + 1))
          case Some(s) => // gap broken: the previous session is final
            out += SessionOut(userId, s.sessId,
              tsFromMicros(s.start), tsFromMicros(s.end), s.n)
            cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.event_id))
          case None =>
            cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.event_id))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close when the watermark passes end + gap; the max() guard keeps
        // the timestamp legal (Spark rejects timeouts at/behind the
        // current watermark) for sessions already older than the watermark
        val endMs = Math.floorDiv(s.end, 1000L) + gapUs / 1000L
        state.setTimeoutTimestamp(math.max(endMs, state.getCurrentWatermarkMs() + 1))
      }
      out.result().iterator
    }
  }

  /** Production streaming sessionization: emits each session exactly once,
    * when it CLOSES — by gap break or by event-time timeout once the
    * watermark passes `session_end + gap`. Requires a watermark on the
    * event stream (EventTimeTimeout contract). Append-mode semantics:
    * downstream consumers never see a session twice, so no snapshot
    * collapse is needed; [[streaming]] is the Update-mode variant for
    * consumers that want live mid-session snapshots. */
  def streamingClosed(events: Dataset[EvT], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, evs: Iterator[EvT], state: GroupState[SessionState]) =>
          sessionizeClosedGroup(gapUs)(uid,
            evs.map(e => Ev(e.user_id, microsOf(e.ts), e.event_id)), state))
  }

  /** Collapse session snapshots to their final extent: one row per session
    * IDENTITY (user, sess_id = opening event id). Keying on identity
    * instead of (user, session_start) means a late event that WIDENS the
    * stored start collapses both snapshots into one row — min(start) /
    * max(end) pick each bound's furthest extent. */
  def latestSnapshot(snapshots: DataFrame): DataFrame =
    snapshots.groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("session_start")).as("session_start"),
        max(col("session_end")).as("session_end"), max(col("n")).as("n"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n"))
      .orderBy("user_id", "session_start")

  /** The built-in `session_window` formulation — per the extension
    * preference order (compose existing ops first), this is the variant
    * to reach for when the output can be "one row per closed session":
    * Spark manages merge/state natively in both batch and streaming.
    * [[streaming]]'s flatMapGroupsWithState exists for the semantics the
    * built-in can't express (mid-session snapshots in Update mode).
    * Columns match [[batch]]. Boundary note: the built-in merges an event
    * into a session while `next < prev + gap` (half-open), whereas
    * [[batch]] keeps it while `next - prev <= gap` — they differ only
    * when a gap equals the threshold exactly, which µs-precision event
    * data never hits. */
  def sessionWindow(events: DataFrame, gapMinutes: Int): DataFrame =
    events.groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n"))
      .drop("session_window")
      .orderBy("user_id", "session_start")
}
