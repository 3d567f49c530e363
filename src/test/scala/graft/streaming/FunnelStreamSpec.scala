package graft.streaming

import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.streaming.FunnelStream.{FEv, FState}

/** Cross-micro-batch state chaining of the streaming funnel: carrying
  * (stage, last-matched-ts) must make a multi-batch run equal the batch
  * fold, emissions must be monotone and advance-only. */
class FunnelStreamSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val steps = IndexedSeq("view", "click", "purchase")

  private final class FakeState(var opt: Option[FState])
      extends GroupState[FState] {
    def exists: Boolean = opt.isDefined
    def get: FState = opt.get
    def getOption: Option[FState] = opt
    def update(s: FState): Unit = opt = Some(s)
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

  test("stage advances across micro-batches through carried state") {
    // view lands in batch 1; click+purchase in batch 2 (scrambled order
    // within the batch — the group fn must sort)
    val st = new FakeState(None)
    val b1 = Seq(FEv(1L, 10L, 1L, "view"), FEv(1L, 11L, 2L, "other"))
    val b2 = Seq(FEv(1L, 30L, 4L, "purchase"), FEv(1L, 20L, 3L, "click"))
    val o1 = FunnelStream.funnelGroup(steps)(1L, b1.iterator, st).toList
    val o2 = FunnelStream.funnelGroup(steps)(1L, b2.iterator, st).toList
    assert(o1.map(_.stage) == List(1))
    assert(o2.map(_.stage) == List(3))
    assert(st.get == FState(3, 30L))
  }

  test("non-advancing batches emit nothing and leave state untouched") {
    val st = new FakeState(Some(FState(1, 10L)))
    // wrong order: purchase before click never advances stage 1
    val out = FunnelStream.funnelGroup(steps)(1L,
      Iterator(FEv(1L, 20L, 5L, "purchase"), FEv(1L, 25L, 6L, "view")), st)
    assert(out.isEmpty && st.get == FState(1, 10L))
  }

  test("strict ordering: a step at the SAME ts as the previous match does not advance") {
    val st = new FakeState(None)
    val out = FunnelStream.funnelGroup(steps)(1L,
      Iterator(FEv(1L, 10L, 1L, "view"), FEv(1L, 10L, 2L, "click"),
        FEv(1L, 11L, 3L, "click")), st).toList
    // click@10 is not strictly after view@10; click@11 is
    assert(out.map(_.stage) == List(2) && st.get == FState(2, 11L))
  }

  test("multi-batch fold equals the batch operator on the events table") {
    val ev = graft.queries.Queries.table(spark, sf0001, "events")
    val typed = ev.select($"user_id",
        org.apache.spark.sql.functions.unix_micros($"ts").as("ts_us"),
        $"event_id", $"event_type".as("et"))
      .as[FEv].collect()
      .sortBy(e => (e.ts_us, e.event_id))
    // split into 3 "micro-batches" respecting event time across batches
    val cut1 = typed.length / 3
    val cut2 = 2 * typed.length / 3
    val batches = Seq(typed.slice(0, cut1), typed.slice(cut1, cut2),
      typed.slice(cut2, typed.length))
    val states = scala.collection.mutable.Map[Long, FakeState]()
    val finalStage = scala.collection.mutable.Map[Long, Int]()
    batches.foreach { b =>
      b.groupBy(_.user_id).foreach { case (u, evs) =>
        val st = states.getOrElseUpdate(u, new FakeState(None))
        FunnelStream.funnelGroup(steps)(u, evs.iterator, st).toList
          .foreach(o => finalStage(u) = o.stage)
      }
    }
    val streamed = finalStage.toMap
    val batch = graft.ops.Funnel.funnel(ev, steps)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    // compare reach counts derived from per-user stages
    val reach = (1 to steps.size).map(i =>
      i.toLong -> streamed.values.count(_ >= i).toLong).toMap
    assert((1 to steps.size).forall(i => reach(i.toLong) == batch(i.toLong)))
    assert(reach(1L) > 0)
  }
}
