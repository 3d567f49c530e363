package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class IntervalsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("overlap merges, touch merges, gap splits, counts are per-span") {
    val iv = Seq(
      // key 1: [0,10) [5,20) overlap; [20,30) touches -> one span [0,30)
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 20L), (1L, 3L, 20L, 30L),
      // then a gap -> second span [40,45)
      (1L, 4L, 40L, 45L),
      // key 2: contained interval collapses
      (2L, 5L, 0L, 100L), (2L, 6L, 10L, 20L)
    ).toDF("k", "id", "s", "e")
    val out = Intervals.mergeIntervals(iv, "k", "s", "e", "id")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq((1L, 0L, 30L, 3L), (1L, 40L, 45L, 1L),
      (2L, 0L, 100L, 2L)))
  }

  test("equal starts tie-break deterministically by id") {
    val iv = Seq((1L, 2L, 0L, 5L), (1L, 1L, 0L, 50L), (1L, 3L, 10L, 20L))
      .toDF("k", "id", "s", "e").repartition(3)
    val out = Intervals.mergeIntervals(iv, "k", "s", "e", "id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, 50L, 3L)))
  }

  test("one shuffle total: the span aggregation reuses the window's placement") {
    val iv = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("user_id").as("k"), col("event_id").as("id"),
        col("event_id").as("s"), (col("event_id") + 10).as("e"))
    val plan = Intervals.mergeIntervals(iv, "k", "s", "e", "id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 Exchange, got $exchanges:\n$plan")
  }
}
