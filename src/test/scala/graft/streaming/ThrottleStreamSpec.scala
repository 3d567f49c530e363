package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.streaming.ThrottleStream.{TEv, TState}

/** Cross-micro-batch state chaining of the streaming throttle: the
  * carried last-kept timestamp must make a multi-batch run verdict-equal
  * to the batch fold — including the trap where the batch boundary falls
  * between a kept event and a dropped one (the dropped event's clock
  * must still anchor on the PREVIOUS batch's kept event). */
class ThrottleStreamSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private final class FakeState(var opt: Option[TState])
      extends GroupState[TState] {
    def exists: Boolean = opt.isDefined
    def get: TState = opt.get
    def getOption: Option[TState] = opt
    def update(s: TState): Unit = opt = Some(s)
    def remove(): Unit = opt = None
    def hasTimedOut: Boolean = false
    def setTimeoutDuration(ms: Long): Unit = ()
    def setTimeoutDuration(d: String): Unit = ()
    def setTimeoutTimestamp(ms: Long): Unit = ()
    def setTimeoutTimestamp(ms: Long, add: String): Unit = ()
    def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
    def setTimeoutTimestamp(ts: java.sql.Date, add: String): Unit = ()
    def getCurrentWatermarkMs(): Long = 0L
    def getCurrentProcessingTimeMs(): Long = 0L
  }

  test("micro-batches chained through state equal the batch fold") {
    // gap 10000 µs; chain: 0 K, 5000 D | 9000 D, 10000 K | 19000 D, 21000 K
    // batch boundaries fall mid-window both times
    val all = Seq(TEv(1L, 0L, 1L), TEv(1L, 5000L, 2L), TEv(1L, 9000L, 3L),
      TEv(1L, 10000L, 4L), TEv(1L, 19000L, 5L), TEv(1L, 21000L, 6L))
    val batches = Seq(all.slice(0, 2), all.slice(2, 4), all.slice(4, 6))
    val st = new FakeState(None)
    val streamed = batches.flatMap(b =>
      // scrambled within-batch arrival: the group fn must sort
      ThrottleStream.throttleGroup(10000L)(1L, b.reverse.iterator, st).toList)
      .map(o => (o.event_id, o.kept))
    val df = all.map(e => (e.user_id,
        Timestamp.from(java.time.Instant.EPOCH.plusNanos(e.ts_us * 1000)),
        e.event_id))
      .toDF("user_id", "ts", "event_id")
    val batch = graft.ops.TimeSeries.throttle(df, "user_id", "ts",
        "event_id", gapMs = 10)
      .as[(Long, Long, Boolean)].collect().sortBy(_._2)
      .map(r => (r._2, r._3)).toSeq
    assert(streamed == batch)
    assert(batch.map(_._2) == Seq(true, false, false, true, false, true))
    // state after the run is the last kept timestamp
    assert(st.opt.contains(TState(21000L)))
  }

  test("fresh key keeps its first event; state is one long") {
    val st = new FakeState(None)
    val out = ThrottleStream.throttleGroup(1000L)(
      7L, Iterator(TEv(7L, 42L, 9L)), st).toList
    assert(out.map(o => (o.event_id, o.kept)) == List((9L, true)))
    assert(st.opt.contains(TState(42L)))
  }
}
