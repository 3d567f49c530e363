package graft.streaming

import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize.{Ev, SessionState}

/** Unit tests of the keyed state-transition function itself, covering the
  * cross-micro-batch cases a single-batch file stream cannot reach. */
class SessionizeStateSpec extends AnyFunSuite {

  /** Minimal in-memory GroupState (only the methods the functions use). */
  private final class FakeState(var opt: Option[SessionState],
      var timedOut: Boolean = false, var watermarkMs: Long = 0L)
      extends GroupState[SessionState] {
    var timeoutTs: Long = -1L
    def exists: Boolean = opt.isDefined
    def get: SessionState = opt.get
    def getOption: Option[SessionState] = opt
    def update(s: SessionState): Unit = opt = Some(s)
    def remove(): Unit = opt = None
    def hasTimedOut: Boolean = timedOut
    def setTimeoutDuration(ms: Long): Unit = ()
    def setTimeoutDuration(d: String): Unit = ()
    def setTimeoutTimestamp(ms: Long): Unit = timeoutTs = ms
    def setTimeoutTimestamp(ms: Long, add: String): Unit = ()
    def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
    def setTimeoutTimestamp(ts: java.sql.Date, add: String): Unit = ()
    def getCurrentWatermarkMs(): Long = watermarkMs
    def getCurrentProcessingTimeMs(): Long = 0L
  }

  private val gapUs = 30L * 60 * 1000000 // 30 min
  private def min(m: Long): Long = m * 60 * 1000000

  test("a late event inside the stored session never moves the end backwards") {
    // batch 1: events at 0 and 1000s -> state end = 1000s
    val st = new FakeState(None)
    Sessionize.sessionizeGroup(gapUs)(1L,
      Iterator(Ev(1L, 0L, 1L), Ev(1L, 1000L * 1000000, 2L)), st).toList
    assert(st.get.end == 1000L * 1000000)
    // batch 2: late event at 500s merges but must keep end = 1000s
    Sessionize.sessionizeGroup(gapUs)(1L,
      Iterator(Ev(1L, 500L * 1000000, 3L)), st).toList
    assert(st.get.end == 1000L * 1000000, "late event moved session end backwards")
    assert(st.get.n == 3)
    // batch 3: event at 2400s is within 30min of the TRUE end (1000s ->
    // gap 1400s < 1800s): must extend, not open a new session
    val out = Sessionize.sessionizeGroup(gapUs)(1L,
      Iterator(Ev(1L, 2400L * 1000000, 4L)), st).toList
    assert(st.get.n == 4, "session was wrongly split after a late event")
    assert(out.map(_.n).max == 4)
  }

  test("a late event before the stored start extends the start") {
    val st = new FakeState(Some(SessionState(min(10), min(20), 2, 1L)))
    Sessionize.sessionizeGroup(gapUs)(1L, Iterator(Ev(1L, min(5), 9L)), st).toList
    assert(st.get.start == min(5) && st.get.end == min(20) && st.get.n == 3)
    assert(st.get.sessId == 1L, "late event must not change the session identity")
  }

  test("closed-session fn: gap break emits the finished session only; timeout set at end+gap") {
    val st = new FakeState(None)
    // events: session A (0s, 10s), then 2500s (> 30min gap) opens session B
    val out = Sessionize.sessionizeClosedGroup(gapUs)(1L,
      Iterator(Ev(1L, 0L, 1L), Ev(1L, 10L * 1000000, 2L), Ev(1L, 2500L * 1000000, 3L)),
      st).toList
    assert(out.map(o => (o.sess_id, o.n)) == List((1L, 2L)), "only session A is closed")
    assert(st.get.sessId == 3L && st.get.n == 1, "session B stays open in state")
    assert(st.timeoutTs == 2500L * 1000 + gapUs / 1000, "timeout = end + gap (ms)")
  }

  test("closed-session fn: watermark timeout emits the final row and clears state") {
    val st = new FakeState(Some(SessionState(min(10), min(20), 4, 7L)), timedOut = true)
    val out = Sessionize.sessionizeClosedGroup(gapUs)(1L, Iterator.empty, st).toList
    assert(out.map(o => (o.sess_id, o.n)) == List((7L, 4L)))
    assert(out.head.session_start.getTime == min(10) / 1000)
    assert(out.head.session_end.getTime == min(20) / 1000)
    assert(st.opt.isEmpty, "closed session must leave no state behind")
  }

  test("closed-session fn: timeout timestamp stays ahead of the watermark") {
    // a session already older than the watermark must still register a
    // LEGAL timeout (Spark rejects timestamps at/behind the watermark)
    val st = new FakeState(None, watermarkMs = min(100) / 1000)
    Sessionize.sessionizeClosedGroup(gapUs)(1L, Iterator(Ev(1L, 0L, 1L)), st).toList
    assert(st.timeoutTs > min(100) / 1000)
  }

  test("streaming sessionization is identical under memory and RocksDB state stores") {
    val spark = graft.SharedSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def run(tag: String): Seq[(Long, Long, Long, Long)] = {
      val stream = graft.queries.Queries
        .stagedEventStream(spark, "/root/testdata/sf0.001", s"ssp_$tag")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .as[Ev]
      val sessions = Sessionize.streaming(stream, gapMinutes = 30)
      Sessionize.latestSnapshot(
        graft.queries.Queries.runToMemorySink(sessions.toDF(), s"ssp_$tag", "update"))
        .select(col("user_id"), unix_micros(col("session_start")),
          unix_micros(col("session_end")), col("n"))
        .as[(Long, Long, Long, Long)].collect().toSeq
    }
    // the friendly switch is what runToMemorySink honors at query start
    spark.conf.set(StateStores.SwitchKey, "memory")
    val mem = try run("mem") finally spark.conf.unset(StateStores.SwitchKey)
    spark.conf.set(StateStores.SwitchKey, "rocksdb")
    val rocks = try run("rocks") finally spark.conf.unset(StateStores.SwitchKey)
    assert(spark.conf.getOption(StateStores.ProviderKey)
      .contains(StateStores.RocksDBProvider), "switch did not reach providerClass")
    assert(mem.nonEmpty && rocks == mem,
      s"providers disagree: memory=${mem.size} rows, rocksdb=${rocks.size} rows")
  }

  test("start-widening late event collapses to ONE session row in latestSnapshot") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").getOrCreate()
    import spark.implicits._
    // batch 1 opens the session at min(10); batch 2's late event widens the
    // start to min(5): two snapshots with DIFFERENT session_start values
    val st = new FakeState(None)
    val snap1 = Sessionize.sessionizeGroup(gapUs)(1L,
      Iterator(Ev(1L, min(10), 7L), Ev(1L, min(20), 8L)), st).toList
    val snap2 = Sessionize.sessionizeGroup(gapUs)(1L,
      Iterator(Ev(1L, min(5), 9L)), st).toList
    val snaps = (snap1 ++ snap2).toDS().toDF()
    assert(snaps.select("session_start").distinct().count() == 2,
      "fixture must actually widen the start")
    val collapsed = Sessionize.latestSnapshot(snaps).collect()
    assert(collapsed.length == 1,
      s"start-widening late event produced ${collapsed.length} session rows")
    val r = collapsed.head
    assert(r.getTimestamp(1).getTime == min(5) / 1000)
    assert(r.getTimestamp(2).getTime == min(20) / 1000)
    assert(r.getLong(3) == 3)
  }
}
