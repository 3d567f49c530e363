package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.streaming.CoVisitStream.{CvEv, CvPair, CvState}

/** The streaming co-visitation invariant: every unordered distinct pair
  * of a basket is emitted exactly once — at the moment its second member
  * arrives — so summed emissions equal the batch miner's counts under
  * ANY batch split of the arrivals. */
class CoVisitStreamSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private final class FakeState(var opt: Option[CvState])
      extends GroupState[CvState] {
    def exists: Boolean = opt.isDefined
    def get: CvState = opt.get
    def getOption: Option[CvState] = opt
    def update(s: CvState): Unit = opt = Some(s)
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

  private def run(st: FakeState, items: Seq[Long],
      maxBasket: Int = 10000): List[CvPair] =
    CoVisitStream.coVisitGroup(maxBasket)(
      1L, items.map(CvEv(1L, _)).iterator, st).toList

  test("pairs emit exactly once, at the second member's arrival") {
    val st = new FakeState(None)
    assert(run(st, Seq(10L)) == Nil)                 // lone item: no pair
    assert(run(st, Seq(20L)) == List(CvPair(10L, 20L)))
    // re-arrivals of known items emit nothing, state untouched
    assert(run(st, Seq(10L, 20L, 10L)) == Nil)
    assert(st.get.items.toSeq == Seq(10L, 20L))
    // a third item pairs against both existing ones
    assert(run(st, Seq(5L)).toSet == Set(CvPair(5L, 10L), CvPair(5L, 20L)))
  }

  test("within-batch duplicates collapse; new-new pairs emitted") {
    val st = new FakeState(None)
    val out = run(st, Seq(3L, 1L, 3L, 2L))
    assert(out.toSet == Set(CvPair(1L, 2L), CvPair(1L, 3L), CvPair(2L, 3L)))
    assert(out.size == 3)
  }

  test("maxBasket bounds state; full baskets absorb new items silently") {
    val st = new FakeState(None)
    assert(run(st, Seq(1L, 2L), maxBasket = 2).size == 1)
    assert(run(st, Seq(9L), maxBasket = 2) == Nil)
    assert(st.get.items.length == 2)
  }

  test("random batch splits: summed emissions equal the batch fold") {
    val rnd = new scala.util.Random(7)
    val arrivals = (1 to 120).map(_ =>
      (rnd.nextInt(8).toLong, rnd.nextInt(12).toLong)) // (basket, item)
    // direct batch counts over distinct pairs per basket
    val expected = arrivals.distinct.groupBy(_._1).values.flatMap { b =>
      val its = b.map(_._2).distinct.sorted
      for (i <- its.indices; j <- i + 1 until its.size) yield (its(i), its(j))
    }.groupBy(identity).map { case (p, v) => (p._1, p._2, v.size.toLong) }
    // streamed in 5 random chunks through per-basket carried state
    val chunks = arrivals.grouped(25).toSeq
    val states = scala.collection.mutable.Map.empty[Long, FakeState]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[CvPair]
    chunks.foreach { ch =>
      ch.groupBy(_._1).foreach { case (bk, evs) =>
        val st = states.getOrElseUpdate(bk, new FakeState(None))
        emitted ++= CoVisitStream.coVisitGroup(10000)(
          bk, evs.map { case (b, i) => CvEv(b, i) }.iterator, st)
      }
    }
    val got = emitted.groupBy(identity)
      .map { case (p, v) => (p.pa, p.pb, v.size.toLong) }
    assert(got.toSet == expected.toSet)
  }

  test("end-to-end stream equals the batch operator on real lineitem") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val src = graft.queries.Queries.stagedTableStream(
        spark, "/root/testdata/sf0.001", "cvspec", "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .as[CvEv]
    val pairs = CoVisitStream.streaming(src)
    val cooc = graft.queries.Queries
      .runToMemorySink(pairs.toDF(), "cvspec", "update")
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cooc"))
    val streamed = graft.ops.Recs.serveTopK(cooc, 5)
      .orderBy($"part", $"cooc".desc, $"rec")
      .as[(Long, Long, Long)].collect().toSeq
    val direct = graft.ops.Recs
      .coVisitation(li, "l_orderkey", "l_partkey", k = 5)
      .orderBy($"part", $"cooc".desc, $"rec")
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamed == direct)
    assert(streamed.nonEmpty)
  }
}
