package graft.streaming

import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.streaming.EnrichStream.{AState, In, Out}

/** Cross-micro-batch state chaining of the streaming PIT enrichment:
  * carrying the current version per key must make a multi-batch run
  * equal the batch pitJoin; facts enrich at EVENT time with the
  * pitJoin tie rule (version before fact at equal instants). */
class EnrichStreamSpec extends AnyFunSuite with SparkTest {
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

  private def dim(k: Long, ts: Long, a: String) = In(k, ts, 0, a, -1L)
  private def fact(k: Long, ts: Long, id: Long) = In(k, ts, 1, null, id)

  test("facts enrich with the version current at their event time; pre-version facts get NULL") {
    val st = new FakeState(None)
    val out = EnrichStream.enrichGroup(1L, Iterator(
      fact(1L, 5L, 100L),           // before any version -> NULL
      dim(1L, 10L, "A"),
      fact(1L, 10L, 101L),          // same instant: version applies FIRST
      fact(1L, 15L, 102L),
      dim(1L, 20L, "B"),
      fact(1L, 25L, 103L)), st).toList
    assert(out == List(
      Out(100L, 1L, 5L, null), Out(101L, 1L, 10L, "A"),
      Out(102L, 1L, 15L, "A"), Out(103L, 1L, 25L, "B")))
    assert(st.get == AState(20L, "B"))
  }

  test("state chains across micro-batches; within-batch order is sorted") {
    val st = new FakeState(None)
    // batch 1 carries only the version
    assert(EnrichStream.enrichGroup(1L,
      Iterator(dim(1L, 10L, "A")), st).isEmpty)
    // batch 2 arrives scrambled: the fact at 12 still sees version A
    val o2 = EnrichStream.enrichGroup(1L, Iterator(
      fact(1L, 30L, 2L), dim(1L, 20L, "B"), fact(1L, 12L, 1L)), st).toList
    assert(o2 == List(Out(1L, 1L, 12L, "A"), Out(2L, 1L, 30L, "B")))
  }

  test("a duplicate/older version row never regresses the carried state") {
    val st = new FakeState(Some(AState(20L, "B")))
    val out = EnrichStream.enrichGroup(1L, Iterator(
      dim(1L, 10L, "A"), fact(1L, 25L, 7L)), st).toList
    assert(out == List(Out(7L, 1L, 25L, "B")) && st.get == AState(20L, "B"))
  }

  test("multi-batch fold equals the batch pitJoin on the orders-derived dimension") {
    import org.apache.spark.sql.functions._
    val o = graft.queries.Queries.table(spark, sf0001, "orders")
    val log = o.groupBy($"o_custkey", $"o_orderdate")
      .agg(max_by($"o_orderstatus", $"o_orderkey").as("status"))
    val rows = (log.select($"o_custkey".as("k"),
        unix_micros($"o_orderdate".cast("timestamp")).as("ts_us"),
        lit(0).as("kind"), $"status".as("attr"), lit(-1L).as("fact_id"))
      .unionByName(o.select($"o_custkey".as("k"),
        unix_micros($"o_orderdate".cast("timestamp")).as("ts_us"),
        lit(1).as("kind"), lit(null).cast("string").as("attr"),
        $"o_orderkey".as("fact_id"))))
      .as[In].collect().sortBy(r => (r.ts_us, r.kind, r.fact_id))
    val cut1 = rows.length / 3
    val cut2 = 2 * rows.length / 3
    val states = scala.collection.mutable.Map[Long, FakeState]()
    val got = Seq(rows.slice(0, cut1), rows.slice(cut1, cut2),
        rows.slice(cut2, rows.length)).flatMap { b =>
      b.groupBy(_.k).flatMap { case (k, rs) =>
        EnrichStream.enrichGroup(k,
          rs.iterator, states.getOrElseUpdate(k, new FakeState(None))).toList
      }
    }.map(r => r.fact_id -> r.attr).toMap
    val dimTable = graft.ops.Dimension.scd2Build(log, "o_custkey",
        "o_orderdate", Seq("status"))
      .withColumnRenamed("status", "status_at_order")
    val want = graft.ops.Dimension.pitJoin(
        o.select($"o_orderkey", $"o_custkey", $"o_orderdate"),
        dimTable, "o_custkey", "o_orderdate", Seq("status_at_order"))
      .select($"o_orderkey", $"status_at_order")
      .as[(Long, String)].collect().map(r => r._1 -> r._2).toMap
    assert(got.nonEmpty && got == want)
  }
}
