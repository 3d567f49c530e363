package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class SessionsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def ev(rows: (Long, Long, Long)*) =
    rows.map { case (u, t, id) => (u, ts(t), id) }
      .toDF("user_id", "ts", "event_id")

  private val gapUs = 1800L * 1000000L // 30 min

  private def run(df: org.apache.spark.sql.DataFrame) =
    Sessions.sessionStats(df, gapUs)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)

  test("sessions split at gaps; counts, longest run, max duration") {
    val df = ev(
      // u1: [0, 60, 120] then gap, [4000, 4030] — 2 sessions
      (1L, 0L, 1L), (1L, 60L, 2L), (1L, 120L, 3L),
      (1L, 4000L, 4L), (1L, 4030L, 5L),
      // u2: single event — one zero-duration session
      (2L, 10L, 6L))
    assert(run(df) == Seq((1L, 2L, 3L, 120L * 1000000L), (2L, 1L, 1L, 0L)))
  }

  test("a gap of exactly gapUs does NOT split (strictly-greater contract)") {
    val df = ev((1L, 0L, 1L), (1L, 1800L, 2L), (1L, 3601L, 3L))
    // 0 -> 1800 s is exactly the gap (continues); 1800 -> 3601 exceeds it
    assert(run(df) == Seq((1L, 2L, 2L, 1800L * 1000000L)))
  }

  test("sessionStatsSegmented is bit-equal to the whole-series fold") {
    val day = 86400L
    val df = ev(
      // u1: session OPEN across the midnight boundary (continues)
      (1L, day - 600L, 1L), (1L, day + 600L, 2L),
      // u2: closes before the boundary, new session after
      (2L, day - 7200L, 3L), (2L, day + 600L, 4L),
      // u3: active in one segment only
      (3L, 100L, 5L), (3L, 200L, 6L),
      // u4: three segments, longest run in the middle one
      (4L, 10L, 7L), (4L, day + 10L, 8L), (4L, day + 70L, 9L),
      (4L, day + 130L, 10L), (4L, 2 * day + 10L, 11L))
    val whole = run(df)
    val seg = Sessions.sessionStatsSegmented(df, gapUs, to_date(col("ts")))
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(seg == whole)
    // the open-session case really continued (1 session, not 2)
    assert(whole.find(_._1 == 1L).get._2 == 1L)
    // and on the real events table: day segments vs whole series
    val events = graft.queries.Queries.table(spark, sf0001, "events")
    val w2 = Sessions.sessionStats(events, gapUs)
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val s2 = Sessions.sessionStatsSegmented(events, gapUs, to_date(col("ts")))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(w2.nonEmpty && s2 == w2)
  }
}
