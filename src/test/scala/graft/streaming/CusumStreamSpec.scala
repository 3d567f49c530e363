package graft.streaming

import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.streaming.CusumStream.{MEv, MState}

/** The streaming CUSUM monitor's carried (k, S, best) state must make a
  * multi-batch run emit exactly the strictly-improving peak sequence of
  * the whole-series statistic. */
class CusumStreamSpec extends AnyFunSuite with SparkTest {

  private final class FakeState(var opt: Option[MState])
      extends GroupState[MState] {
    def exists: Boolean = opt.isDefined
    def get: MState = opt.get
    def getOption: Option[MState] = opt
    def update(s: MState): Unit = opt = Some(s)
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

  test("multi-batch peaks equal the whole-series running statistic") {
    // ref mean 2 (sum_ref 8, n_ref 4); series: 2, 2, 5, 5, 5 —
    // C_k*4 = 4*S_k - k*8: 0, 0, 12, 24, 36 (units). The FIRST event
    // emits its 0-peak (bestAbs seeds below zero) — required so an
    // all-flat series still snapshots to its earliest row, the batch
    // tie rule; then strictly improving peaks at k = 3, 4, 5.
    val refs = Map("a" -> (8L, 4L))
    val evs = Seq(2L, 2L, 5L, 5L, 5L).zipWithIndex.map { case (u, i) =>
      MEv("a", (i + 1).toLong, (i + 1).toLong, u)
    }
    val st = new FakeState(None)
    val out = Seq(evs.take(2), evs.slice(2, 4), evs.drop(4)).flatMap(b =>
      CusumStream.monitorGroup(refs)("a", b.reverse.iterator, st).toList)
    assert(out.map(o => (o.event_id, o.cusum_xnref)) ==
      Seq((1L, 0L), (3L, 12L), (4L, 24L), (5L, 36L)))
    assert(st.opt.contains(MState(5L, 19L, 36L)))
    // unreferenced key emits nothing and keeps no state
    val st2 = new FakeState(None)
    assert(CusumStream.monitorGroup(refs)("zz", evs.iterator, st2).isEmpty)
    assert(st2.opt.isEmpty)
  }
}
