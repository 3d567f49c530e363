package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.streaming.AttributionStream.{AEv, AState}

/** Cross-micro-batch state chaining of streaming last-touch attribution:
  * the carried channel must make a multi-batch run credit-equal to the
  * batch window — including the traps where (a) the batch boundary falls
  * between a touch and its conversion, and (b) a conversion lands at the
  * SAME instant as a touch (the strictness rule: same-instant touches
  * are invisible to the conversion). */
class AttributionStreamSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private final class FakeState(var opt: Option[AState])
      extends GroupState[AState] {
    def exists: Boolean = opt.isDefined
    def get: AState = opt.get
    def getOption: Option[AState] = opt
    def update(s: AState): Unit = opt = Some(s)
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

  private def touch(ts: Long, id: Long, ch: Long) =
    AEv(1L, ts, id, Some(ch), None)
  private def conv(ts: Long, id: Long, v: Double) =
    AEv(1L, ts, id, None, Some(v))

  test("state chains across batches; same-instant touch is invisible") {
    // batch 1: organic conv, touch ch=3 | batch 2: conv (credits 3),
    // touch ch=5 AND a conv at the SAME instant (must credit 3, not 5)
    val b1 = Seq(conv(100L, 1L, 1.0), touch(200L, 2L, 3L))
    val b2 = Seq(conv(300L, 3L, 2.0), touch(400L, 4L, 5L),
      conv(400L, 5L, 4.0))
    val st = new FakeState(None)
    val streamed = Seq(b1, b2).flatMap(b =>
      // scrambled within-batch arrival: the group fn must sort
      AttributionStream.attGroup(1L, b.reverse.iterator, st).toList)
      .map(o => (o.event_id, o.channel, o.conv))
    assert(streamed == Seq((1L, None, 1.0), (3L, Some(3L), 2.0),
      (5L, Some(3L), 4.0)))
    // state after the run is the last touch channel
    assert(st.opt.contains(AState(5L)))
  }

  test("multi-batch streamed credits equal the batch lastTouch window (seeded)") {
    val rnd = new scala.util.Random(4242)
    val evs = (1 to 400).map { i =>
      val user = rnd.nextInt(7).toLong
      val ts = rnd.nextInt(50).toLong * 1000L // dense ts -> many ties
      if (rnd.nextBoolean()) AEv(user, ts, i.toLong, Some(rnd.nextInt(4).toLong), None)
      else AEv(user, ts, i.toLong, None, Some(rnd.nextInt(100) / 10.0))
    }
    // batch boundaries at arbitrary points; within each batch each key's
    // events may arrive in any order, but batches themselves must be
    // time-ordered per key (the documented landing contract) — so split
    // by time range, not by arrival index
    val batches = Seq(
      evs.filter(_.ts_us < 15000L), evs.filter(e => e.ts_us >= 15000L && e.ts_us < 30000L),
      evs.filter(_.ts_us >= 30000L))
    val states = scala.collection.mutable.Map.empty[Long, FakeState]
    val streamed = batches.flatMap { b =>
      b.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        val st = states.getOrElseUpdate(u, new FakeState(None))
        AttributionStream.attGroup(u, rnd.shuffle(es).iterator, st).toList
      }
    }.map(o => (o.user_id, o.event_id, o.channel, o.conv)).sortBy(t => (t._1, t._2))
    val df = evs.map(e => (e.user_id,
        Timestamp.from(java.time.Instant.EPOCH.plusNanos(e.ts_us * 1000L)),
        e.event_id, e.touch, e.conv))
      .toDF("user_id", "ts", "event_id", "touch", "conv")
    val batch = graft.ops.Funnel.lastTouch(df, "user_id", "ts", "event_id",
        col("touch"), col("conv"))
      .select(col("k"), col("id"), col("attributed"), col("conv"))
      .as[(Long, Long, Option[Long], Double)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
