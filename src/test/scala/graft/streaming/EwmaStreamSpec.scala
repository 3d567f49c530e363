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

  private final class FakeState(var opt: Option[YState])
      extends GroupState[YState] {
    def exists: Boolean = opt.isDefined
    def get: YState = opt.get
    def getOption: Option[YState] = opt
    def update(s: YState): Unit = opt = Some(s)
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

  test("first event of a fresh key passes through; state carries one long") {
    val st = new FakeState(None)
    val out = EwmaStream.ewmaGroup(20L)(7L,
      Iterator(VEv(7L, 10L, 1L, 4200L)), st).toList
    assert(out.map(o => (o.event_id, o.ewma_units)) == List((1L, 4200L)))
    assert(st.get.y == 4200L)
  }
}
