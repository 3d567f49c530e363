package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.model.Schemas

/** Reference-semantics tests for the bar operators (SURVEY.md §5.3):
  * session boundary edges, DST transitions, watermark strictness,
  * epoch-cast fidelity, AGG schema Long contract. */
class BarOpsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def barsAtUtc(utc: String*): org.apache.spark.sql.DataFrame =
    utc.map(Timestamp.valueOf).toDF("ts")

  test("session hhmm boundaries are inclusive, 16:00 is regular (utils.py:7-19)") {
    // 2024-01-15 is EST (UTC-5): ET hh:mm = UTC hh:mm - 5
    val df = barsAtUtc(
      "2024-01-15 08:59:00.0", // 03:59 ET — closed
      "2024-01-15 09:00:00.0", // 04:00 ET — premarket start
      "2024-01-15 14:29:00.0", // 09:29 ET — premarket end
      "2024-01-15 14:30:00.0", // 09:30 ET — regular start
      "2024-01-15 21:00:00.0", // 16:00 ET — REGULAR (not afterhours)
      "2024-01-15 21:01:00.0", // 16:01 ET — afterhours start
      "2024-01-16 01:00:00.0", // 20:00 ET — afterhours end
      "2024-01-16 01:01:00.0") // 20:01 ET — closed
    val sessions = BarOps.withEastern(df)
      .withColumn("s", coalesce(BarOps.sessionColumn(col("hhmm")), lit("closed")))
      .orderBy("ts").select("s").as[String].collect().toSeq
    assert(sessions == Seq("closed", "premarket", "premarket", "regular",
      "regular", "afterhours", "afterhours", "closed"))
  }

  test("session classification is DST-aware (America/New_York)") {
    // spring forward 2024-03-10: 09:30 ET == 14:30 UTC before, 13:30 after
    val spring = BarOps.withEastern(barsAtUtc(
      "2024-03-08 14:30:00.0", // EST: 09:30 ET
      "2024-03-11 13:30:00.0", // EDT: 09:30 ET
      "2024-03-11 14:30:00.0")) // EDT: 10:30 ET
      .select("hhmm").as[Int].collect().toSeq
    assert(spring == Seq(930, 930, 1030))
    // fall back 2024-11-03
    val fall = BarOps.withEastern(barsAtUtc(
      "2024-11-01 13:30:00.0", // EDT: 09:30
      "2024-11-04 14:30:00.0")) // EST: 09:30
      .select("hhmm").as[Int].collect().toSeq
    assert(fall == Seq(930, 930))
  }

  test("filterSession passes rows through for unknown session names (utils.py:19)") {
    val df = barsAtUtc("2024-01-15 03:00:00.0", "2024-01-15 15:00:00.0")
    assert(BarOps.filterSession(df, "lunch").count() == 2)
    assert(BarOps.filterSession(df, "regular").count() == 1)
  }

  test("sessions partition the ET day with only the documented gaps") {
    // every minute of an EST day, classified: premarket+regular+afterhours
    // counts must match the inclusive ranges, remainder closed
    val mins = (0 until 1440).map { m =>
      Timestamp.valueOf(f"2024-01-15 ${m / 60}%02d:${m % 60}%02d:00.0")
    }.toDF("ts")
    val counts = BarOps.withEastern(mins)
      .withColumn("s", coalesce(BarOps.sessionColumn(col("hhmm")), lit("closed")))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts("premarket") == 330)  // 04:00-09:29
    assert(counts("regular") == 391)    // 09:30-16:00
    assert(counts("afterhours") == 240) // 16:01-20:00
    assert(counts("closed") == 1440 - 330 - 391 - 240)
  }

  test("watermark filter is strictly greater-than (ingest_massive.py:140-141)") {
    val df = barsAtUtc("2024-01-01 00:00:00.0", "2024-01-02 00:00:00.0",
      "2024-01-03 00:00:00.0")
    val wm = Timestamp.valueOf("2024-01-02 00:00:00.0")
    val kept = BarOps.newerThan(df, wm).as[Timestamp].collect().toSeq
    assert(kept == Seq(Timestamp.valueOf("2024-01-03 00:00:00.0")))
  }

  test("maxTs returns None on empty input, the high-water mark otherwise") {
    val empty = Seq.empty[Timestamp].toDF("ts")
    assert(BarOps.maxTs(empty).isEmpty)
    val df = barsAtUtc("2024-01-01 00:00:00.0", "2024-01-05 00:00:00.0")
    assert(BarOps.maxTs(df).contains(Timestamp.valueOf("2024-01-05 00:00:00.0")))
  }

  test("incremental re-ingest of the 1-day overlap is idempotent (A22+A14)") {
    val lake = barsAtUtc("2024-01-01 00:00:00.0", "2024-01-02 00:00:00.0")
    val refetch = barsAtUtc( // overlaps day 2, adds day 3
      "2024-01-02 00:00:00.0", "2024-01-03 00:00:00.0")
    val wm = BarOps.maxTs(lake).get
    val appended = lake.union(BarOps.newerThan(refetch, wm))
    assert(appended.count() == 3)
    assert(appended.distinct().count() == 3) // no duplicate (ts) rows
  }

  test("normalizeRaw: exact epoch-ms cast, symbol tag, Long volume/trades contract") {
    val raw = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1704067200123L, 1.0, 2.0, 0.5, 1.5, 1000.5, 1.23, 7.0),
        Row(1704067260000L, null, null, null, null, null, null, null)),
      Schemas.raw)
    val out = BarOps.normalizeRaw(raw, "AAPL")
    assert(out.schema.fieldNames.toSeq ==
      Seq("ts", "symbol", "open", "high", "low", "close", "volume", "vwap", "trades"))
    assert(out.schema("volume").dataType.typeName == "long") // declared AGG contract
    assert(out.schema("trades").dataType.typeName == "long")
    val rows = out.orderBy("ts").collect()
    assert(rows(0).getTimestamp(0) == Timestamp.valueOf("2024-01-01 00:00:00.123"))
    assert(rows(0).getString(1) == "AAPL")
    assert(rows(0).getLong(6) == 1000L)
    assert(rows(1).isNullAt(2) && rows(1).isNullAt(6)) // null passthrough
  }

  test("normalizeRaw compat mode reproduces the reference's double-cast path") {
    val raw = spark.createDataFrame(
      java.util.Arrays.asList(Row(1704067200123L, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)),
      Schemas.raw)
    val exact = BarOps.normalizeRaw(raw, "X").select("ts").head.getTimestamp(0)
    val compat = BarOps.normalizeRaw(raw, "X", compatDoubleCast = true)
      .select("ts").head.getTimestamp(0)
    assert(exact == compat) // agree at ms granularity
  }

  test("resampleOhlcv invariants and deterministic open/close on ts ties") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-15 10:00:00.0"), 1L, 10.0),
      (1L, Timestamp.valueOf("2024-01-15 10:05:00.0"), 2L, 30.0),
      (1L, Timestamp.valueOf("2024-01-15 10:05:00.0"), 3L, 5.0), // same ts, id breaks tie
      (1L, Timestamp.valueOf("2024-01-15 10:59:00.0"), 4L, 20.0))
      .toDF("k", "ts", "id", "v")
    val out = BarOps.resampleOhlcv(df, col("k"), col("ts"), col("v"), col("id"))
      .collect().head
    assert(out.getAs[Double]("open") == 10.0)
    assert(out.getAs[Double]("close") == 20.0)
    assert(out.getAs[Double]("high") == 30.0)
    assert(out.getAs[Double]("low") == 5.0)
    assert(out.getAs[Double]("volume") == 65.0)
    assert(out.getAs[Long]("n") == 4L)
    // close ties: last row of the bucket by (ts, id)
    val tie = BarOps.resampleOhlcv(
      df.filter(col("id").isin(2L, 3L)), col("k"), col("ts"), col("v"), col("id"))
      .collect().head
    assert(tie.getAs[Double]("open") == 30.0) // id=2 first
    assert(tie.getAs[Double]("close") == 5.0) // id=3 last
  }
}
