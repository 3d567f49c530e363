package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.streaming.EwmaStream.{VEv, YState}

/** Cross-micro-batch state chaining of the streaming EWMA: the fold's
  * carried y must make a multi-batch run bit-equal to the batch fold. */
class EwmaStreamSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private final class FakeState(var opt: Option[YState],
      var timedOut: Boolean = false, var watermarkMs: Long = 0L)
      extends GroupState[YState] {
    var lastTimeoutMs: Long = Long.MinValue
    def exists: Boolean = opt.isDefined
    def get: YState = opt.get
    def getOption: Option[YState] = opt
    def update(s: YState): Unit = opt = Some(s)
    def remove(): Unit = opt = None
    def hasTimedOut: Boolean = timedOut
    def setTimeoutDuration(ms: Long): Unit = ()
    def setTimeoutDuration(d: String): Unit = ()
    def setTimeoutTimestamp(ms: Long): Unit = lastTimeoutMs = ms
    def setTimeoutTimestamp(ms: Long, add: String): Unit = ()
    def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
    def setTimeoutTimestamp(ts: java.sql.Date, add: String): Unit = ()
    def getCurrentWatermarkMs(): Long = watermarkMs
    def getCurrentProcessingTimeMs(): Long = 0L
  }

  test("two micro-batches chained through state equal the whole-series fold") {
    // values in units; batch 1 = events at t 1..3, batch 2 = t 4..6
    // (arrival respects event time across batches; within-batch order is
    // scrambled — the group fn must sort)
    val all = Seq(
      VEv(1L, 1L, 11L, 1000000L), VEv(1L, 2L, 12L, 2500000L),
      VEv(1L, 3L, 13L, 500000L), VEv(1L, 4L, 14L, 9000000L),
      VEv(1L, 5L, 15L, 4000000L), VEv(1L, 6L, 16L, 100L))
    val (b1, b2) = all.splitAt(3)
    val st = new FakeState(None)
    val out1 = EwmaStream.ewmaGroup(20L)(1L, b1.reverse.iterator, st).toList
    val out2 = EwmaStream.ewmaGroup(20L)(1L, b2.reverse.iterator, st).toList
    val streamed = (out1 ++ out2).map(o => (o.event_id, o.ewma_units))

    val df = all.map(e => (e.user_id, new Timestamp(e.ts_us / 1000),
      e.event_id, e.xu / 1e6)).toDF("user_id", "ts", "event_id", "value")
    val batch = graft.ops.TimeSeries.ewma(df, "user_id", "ts", "event_id",
        "value", 20)
      .as[(Long, Long, Long)].collect().sortBy(_._2).map(r => (r._2, r._3)).toSeq
    assert(streamed == batch && batch.size == 6)
  }

  test("TTL group fn: live keys emit values bit-identical to the NoTimeout fn") {
    val all = Seq(
      VEv(1L, 1000000L, 11L, 1000000L), VEv(1L, 2000000L, 12L, 2500000L),
      VEv(1L, 3000000L, 13L, 500000L), VEv(1L, 4000000L, 14L, 9000000L))
    val (b1, b2) = all.splitAt(2)
    val plain = new FakeState(None)
    val p = (EwmaStream.ewmaGroup(20L)(1L, b1.iterator, plain).toList ++
      EwmaStream.ewmaGroup(20L)(1L, b2.iterator, plain).toList)
    val ttl = new FakeState(None)
    val t = (EwmaStream.ewmaGroupTtl(20L, 60000L)(1L, b1.iterator, ttl).toList ++
      EwmaStream.ewmaGroupTtl(20L, 60000L)(1L, b2.iterator, ttl).toList)
    assert(t == p && p.nonEmpty)
    // timeout armed at last event-time ms + ttl
    assert(ttl.lastTimeoutMs == all.last.ts_us / 1000L + 60000L)
  }

  test("TTL group fn: timeout evicts state; the key's next event restarts") {
    val st = new FakeState(None)
    EwmaStream.ewmaGroupTtl(20L, 60000L)(5L,
      Iterator(VEv(5L, 1000000L, 1L, 777L)), st)
      .toList // force the iterator so state updates
    assert(st.exists && st.get.y == 777L)
    // watermark passes the timeout: Spark calls the fn with hasTimedOut
    st.timedOut = true
    val evicted = EwmaStream.ewmaGroupTtl(20L, 60000L)(5L,
      Iterator.empty, st).toList
    assert(evicted.isEmpty && !st.exists)
    // next event after eviction restarts the recurrence at y = x
    st.timedOut = false
    val out = EwmaStream.ewmaGroupTtl(20L, 60000L)(5L,
      Iterator(VEv(5L, 99000000L, 2L, 5000L)), st).toList
    assert(out.map(o => (o.event_id, o.ewma_units)) == List((2L, 5000L)))
  }

  test("TTL group fn: timeout timestamp stays ahead of a later watermark") {
    val st = new FakeState(None, watermarkMs = 500000L)
    EwmaStream.ewmaGroupTtl(20L, 1L)(9L,
      Iterator(VEv(9L, 1000L, 1L, 1L)), st).toList
    // last event at 1 ms + 1 ms ttl is far behind the 500 s watermark:
    // the guard must arm a legal (post-watermark) timeout
    assert(st.lastTimeoutMs == 500001L)
  }

  test("first event of a fresh key passes through; state carries one long") {
    val st = new FakeState(None)
    val out = EwmaStream.ewmaGroup(20L)(7L,
      Iterator(VEv(7L, 10L, 1L, 4200L)), st).toList
    assert(out.map(o => (o.event_id, o.ewma_units)) == List((1L, 4200L)))
    assert(st.get.y == 4200L)
  }
}
