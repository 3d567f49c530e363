package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class FunnelSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.map { case (u, t, id, et) => (u, ts(t), id, et) }
      .toDF("user_id", "ts", "event_id", "event_type")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Funnel.funnel(df, Seq("view", "click", "purchase"))
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)

  test("strict ordering: completions, partials, and out-of-order users") {
    val df = ev(
      // u1 completes in order
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
      // u2 stops after click
      (2L, 10L, 4L, "view"), (2L, 25L, 5L, "click"),
      // u3 purchases BEFORE clicking: reaches click only
      (3L, 10L, 6L, "view"), (3L, 15L, 7L, "purchase"), (3L, 20L, 8L, "click"),
      // u4 never views: reaches nothing
      (4L, 5L, 9L, "click"), (4L, 8L, 10L, "purchase"))
    assert(run(df) == Seq(
      (1L, "view", 3L, 1000000L),
      (2L, "click", 3L, 1000000L),
      (3L, "purchase", 1L, 333333L)))
  }

  test("equal timestamps do NOT advance a stage (strictly-later contract)") {
    val df = ev(
      (1L, 10L, 1L, "view"), (1L, 10L, 2L, "click"), // same instant: no click
      (1L, 11L, 3L, "click"),
      (2L, 10L, 4L, "view"), (2L, 10L, 5L, "click"))
    assert(run(df) == Seq(
      (1L, "view", 2L, 1000000L),
      (2L, "click", 1L, 500000L),
      (3L, "purchase", 0L, 0L)))
  }

  test("later re-occurrence of an earlier step never resets progress") {
    val df = ev(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"),
      (1L, 25L, 3L, "view"), (1L, 30L, 4L, "purchase"))
    assert(run(df).map(r => (r._2, r._3)) ==
      Seq(("view", 1L), ("click", 1L), ("purchase", 1L)))
  }

  test("empty input yields zero rows for every step") {
    val df = ev()
    assert(run(df) == Seq(
      (1L, "view", 0L, 0L), (2L, "click", 0L, 0L), (3L, "purchase", 0L, 0L)))
  }

  test("funnelSegmented is bit-equal to the whole-series funnel (hot-key bound)") {
    import org.apache.spark.sql.functions._
    // cross-boundary advances: u1 views on day 1, clicks on day 2,
    // purchases on day 3; u2's click lands same-instant as its view at
    // a segment boundary (must NOT advance, exactly as unsegmented);
    // u3 active only in one segment; u4 regresses across segments
    val day = 86400L
    val df = ev(
      (1L, 10L, 1L, "view"), (1L, day + 10L, 2L, "click"),
      (1L, 2 * day + 10L, 3L, "purchase"),
      (2L, day - 1L, 4L, "view"), (2L, day - 1L, 5L, "click"),
      (3L, day + 5L, 6L, "view"), (3L, day + 6L, 7L, "click"),
      (4L, 10L, 8L, "purchase"), (4L, day + 10L, 9L, "view"))
    val whole = run(df)
    val seg = Funnel.funnelSegmented(df, Seq("view", "click", "purchase"),
        to_date(col("ts")))
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(seg == whole)
    // and on the real events table: day segments vs whole series
    val events = graft.queries.Queries.table(spark, sf0001, "events")
    val w2 = Funnel.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(_.toSeq).toSeq
    val s2 = Funnel.funnelSegmented(events, Seq("view", "click", "purchase"),
        to_date(col("ts"))).collect().map(_.toSeq).toSeq
    assert(s2 == w2)
  }

  test("lastTouch: strictly-preceding touch wins; same-instant touch is invisible") {
    import org.apache.spark.sql.functions._
    // (user, t, id, type, channel)
    val df = Seq(
      // u1: touch A @10, touch B @20, convert @30 -> B; convert @15 -> A
      (1L, 10L, 1L, "t", "A"), (1L, 20L, 2L, "t", "B"),
      (1L, 15L, 3L, "c", null), (1L, 30L, 4L, "c", null),
      // u2: touch at the SAME instant as the conversion -> organic
      (2L, 50L, 5L, "t", "C"), (2L, 50L, 6L, "c", null),
      // u3: conversion with no touch at all -> organic
      (3L, 70L, 7L, "c", null),
      // u4: two touches at the same ts -> higher id wins
      (4L, 10L, 8L, "t", "D"), (4L, 10L, 9L, "t", "E"), (4L, 20L, 10L, "c", null))
      .map { case (u, t, id, et, ch) => (u, ts(t), id, et, ch) }
      .toDF("user_id", "ts", "event_id", "event_type", "ch")
    val got = Funnel.lastTouch(df, "user_id", "ts", "event_id",
        touch = when(col("event_type") === "t", col("ch")),
        conv = when(col("event_type") === "c", lit(1.0)))
      .select(col("id"), col("attributed"))
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(3L -> Some("A"), 4L -> Some("B"),
      6L -> None, 7L -> None, 10L -> Some("E")))
  }

  test("lastTouch: a row that is both touch and conversion never attributes to itself") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, 10L, 1L, "t", "A"),
      (1L, 20L, 2L, "tc", "B"), // touch AND conversion in one row
      (2L, 10L, 3L, "tc", "C")) // dual row with no prior touch
      .map { case (u, t, id, et, ch) => (u, ts(t), id, et, ch) }
      .toDF("user_id", "ts", "event_id", "event_type", "ch")
    val got = Funnel.lastTouch(df, "user_id", "ts", "event_id",
        touch = when(col("event_type").contains("t"), col("ch")),
        conv = when(col("event_type").contains("c"), lit(1.0)))
      .select(col("id"), col("attributed"))
      .as[(Long, Option[String])].collect().toMap
    // id 2 credits the PRIOR touch A, not its own B; id 3 is organic
    assert(got == Map(2L -> Some("A"), 3L -> None))
  }

  test("positionCredits: 40-20-40 with degenerate journeys and remainders") {
    import org.apache.spark.sql.functions.col
    def ts(ms: Long) = new Timestamp(ms)
    // u1: 5 touches (V C C C V) then buy -> first V 400k, last V 400k,
    //     3 middles C each 200000 div 3 = 66666
    // u2: 1 touch C then buy -> C 1000000
    // u3: 2 touches V C then buy -> 500k each
    // u4: touch after purchase only -> no credit
    val rows = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "click"),
      (1L, 4L, "click"), (1L, 5L, "view"), (1L, 6L, "purchase"),
      (2L, 1L, "click"), (2L, 2L, "purchase"),
      (3L, 1L, "view"), (3L, 2L, "click"), (3L, 3L, "purchase"),
      (4L, 1L, "purchase"), (4L, 2L, "view"))
      .map { case (u, t, e) => (u, ts(t * 1000), t, e) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.positionCredits(rows, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click"), "purchase")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // views: u1 first 400k + u1 last 400k + u3 first 500k = 1300000 (3)
    // clicks: u1 middles 3x66666 + u2 1000000 + u3 last 500k = 1699998 (5)
    assert(got == Map("view" -> ((1300000L, 3L)),
      "click" -> ((1699998L, 5L))))
  }
}
