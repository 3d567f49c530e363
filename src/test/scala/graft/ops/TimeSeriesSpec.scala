package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class TimeSeriesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("ewma recurrence matches a hand fold, first row passes through") {
    val df = Seq(
      (1L, ts(1), 10L, 1.0),
      (1L, ts(2), 11L, 2.0),
      (1L, ts(3), 12L, 3.0),
      (2L, ts(1), 20L, 5.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.ewma(df, "user_id", "ts", "event_id", "value", 20)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // units: x1=1e6, x2=2e6, x3=3e6
    val y1 = 1000000L
    val y2 = (20L * 2000000L + 80L * y1) / 100L
    val y3 = (20L * 3000000L + 80L * y2) / 100L
    assert(out == Seq((1L, 10L, y1), (1L, 11L, y2), (1L, 12L, y3),
      (2L, 20L, 5000000L)))
  }

  test("ordering is by (ts, id) regardless of input row order") {
    val shuffled = Seq(
      (1L, ts(3), 12L, 3.0),
      (1L, ts(1), 10L, 1.0),
      (1L, ts(2), 11L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value").repartition(3)
    val ordered = Seq(
      (1L, ts(1), 10L, 1.0),
      (1L, ts(2), 11L, 2.0),
      (1L, ts(3), 12L, 3.0)
    ).toDF("user_id", "ts", "event_id", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.ewma(df, "user_id", "ts", "event_id", "value", 20)
        .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(run(shuffled) == run(ordered))
  }

  test("toUnits is exact on the 1e-6 grid and engine-stable on negatives") {
    // floor(x·1e6 + 0.5): exact IEEE products here, so the expected
    // values are pinned — -1.25 → floor(-1249999.5) = -1250000,
    // -0.000001 → floor(-0.5) = -1; any platform drift fails loudly
    val vals = Seq(0.0, 1.25, -1.25, 123.456789, -0.000001).toDF("v")
    val units = vals.select(TimeSeries.toUnits($"v")).as[Long].collect().toSeq
    assert(units == Seq(0L, 1250000L, -1250000L, 123456789L, -1L))
  }

  test("ewmaSegmented is bit-equal to the whole-series ewma, including " +
    "keys that skip segments") {
    // key 1 spans 3 days; key 2 appears on day 1 and day 3 only (its
    // state must carry THROUGH day 2's full-outer merge); key 3 exists
    // in one segment only
    val df = Seq(
      (1L, ts(10), 1L, 1.0), (1L, ts(20), 2L, 2.5),
      (1L, ts(86400 + 10), 3L, 3.0), (1L, ts(86400 + 20), 4L, 0.5),
      (1L, ts(2 * 86400 + 5), 5L, 9.0),
      (2L, ts(15), 6L, 4.0),
      (2L, ts(2 * 86400 + 9), 7L, 6.0),
      (3L, ts(86400 + 1), 8L, 7.5)
    ).toDF("user_id", "ts", "event_id", "value")
    val whole = TimeSeries.ewma(df, "user_id", "ts", "event_id", "value", 20)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val seg = TimeSeries.ewmaSegmented(df, "user_id", "ts", "event_id",
        "value", 20, to_date($"ts"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(seg == whole && whole.size == 8)
  }

  test("ewmaSegmented on the real events table matches ewma bit-for-bit") {
    val ev = graft.queries.Queries.normalizeTs(
      spark.read.parquet(s"$sf0001/events.parquet"))
    val whole = TimeSeries.ewma(ev, "user_id", "ts", "event_id", "value", 20)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val seg = TimeSeries.ewmaSegmented(ev, "user_id", "ts", "event_id",
        "value", 20, to_date($"ts"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(seg == whole && whole.nonEmpty)
  }

  test("ewma on the real events table: one output row per input row") {
    val ev = graft.queries.Queries.normalizeTs(
      spark.read.parquet(s"$sf0001/events.parquet"))
    val out = TimeSeries.ewma(ev, "user_id", "ts", "event_id", "value", 20)
    assert(out.count() == ev.count())
    assert(out.select("event_id").distinct().count() == ev.count())
  }

  test("trendFit: exact rational slope/intercept, single-row key -> NULLs") {
    // key "a": y = 2 + 3k exactly (units 1e6): slope must be exactly 3,
    // intercept exactly 2 — i.e. slope_num/den == 3e6, icept_num/den == 2e6
    val rows = ((1 to 5).map(k => ("a", k.toLong, k.toLong, 2.0 + 3.0 * k)) ++
      Seq(("b", 1L, 1L, 7.0))).toDF("k", "ts", "id", "v")
    val got = TimeSeries.trendFit(rows, "k", "ts", "id", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 5L)
    val (sn, in, dn) = (BigDecimal(a.getDecimal(2)), BigDecimal(a.getDecimal(3)),
      BigDecimal(a.getDecimal(4)))
    assert(sn / dn == BigDecimal(3000000) && in / dn == BigDecimal(2000000))
    val b = got("b")
    assert(b.getLong(1) == 1L && b.isNullAt(2) && b.isNullAt(3) && b.isNullAt(4))

    // driver-side replay on a seeded random series: exact integer match
    val rnd = new scala.util.Random(0x7EE0DL)
    val vs = Seq.fill(37)(rnd.nextInt(100000) / 100.0)
    val df = vs.zipWithIndex.map { case (v, i) => ("r", i.toLong, i.toLong, v) }
      .toDF("k", "ts", "id", "v")
    val us = vs.map(v => BigInt(math.floor(v * 1000000 + 0.5).toLong))
    val n = BigInt(us.length)
    val ks = (1 to us.length).map(BigInt(_))
    val (sk, sy) = (ks.sum, us.sum)
    val sky = ks.zip(us).map { case (k, y) => k * y }.sum
    val skk = ks.map(k => k * k).sum
    val r = TimeSeries.trendFit(df, "k", "ts", "id", "v").collect().head
    assert(BigInt(r.getDecimal(2).toBigInteger) == n * sky - sk * sy)
    assert(BigInt(r.getDecimal(3).toBigInteger) == sy * skk - sk * sky)
    assert(BigInt(r.getDecimal(4).toBigInteger) == n * skk - sk * sk)
  }

  test("throttle: hand chain + seeded replay vs driver-side greedy fold") {
    def ts(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plusNanos(us * 1000L))
    // gap 10 ms = 10000 µs; chain on key a in µs: 0 K, 5000 D, 9000 D,
    // 10000 K, 19000 D, 21000 K (19000 is 9000 past the kept 10000 —
    // dropped even though it is 14000 past the DROPPED 5000)
    val ev = Seq(("a", 0L, 1L), ("a", 5000L, 2L), ("a", 9000L, 3L),
      ("a", 10000L, 4L), ("a", 19000L, 5L), ("a", 21000L, 6L),
      ("b", 7L, 7L))
      .map { case (k, us, id) => (k, ts(us), id) }.toDF("k", "ts", "id")
    val got = TimeSeries.throttle(ev, "k", "ts", "id", gapMs = 10)
      .as[(String, Long, Boolean)].collect().sortBy(_._2).toSeq
    assert(got == Seq(("a", 1L, true), ("a", 2L, false), ("a", 3L, false),
      ("a", 4L, true), ("a", 5L, false), ("a", 6L, true), ("b", 7L, true)))

    // seeded replay: random arrivals vs a driver-side greedy fold
    val rnd = new scala.util.Random(0x7407713L)
    val rows = (1 to 400).map(i =>
      ("u" + rnd.nextInt(5), rnd.nextInt(1000000).toLong, i.toLong))
    val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
      var last = Long.MinValue / 4
      var has = false
      rs.sortBy(r => (r._2, r._3)).map { case (_, us, id) =>
        val kept = !has || us - last >= 50000L
        if (kept) { has = true; last = us }
        (k, id, kept)
      }
    }.toSeq.sortBy(_._2)
    val got2 = TimeSeries.throttle(
        rows.map { case (k, us, id) => (k, ts(us), id) }.toDF("k", "ts", "id"),
        "k", "ts", "id", gapMs = 50)
      .as[(String, Long, Boolean)].collect().sortBy(_._2).toSeq
    assert(got2 == want)
  }

  test("trendStatsTime merge-invariance: any split sums to the whole-series fit") {
    val rnd = new scala.util.Random(0x5EED5L)
    val origin = 1704067200000000L
    val rows = (1 to 120).map { i =>
      ("k" + (i % 3), new java.sql.Timestamp(1704067200000L + rnd.nextInt(1000000)),
        rnd.nextInt(100000) / 100.0)
    }
    val df = rows.toDF("k", "ts", "v")
    val whole = TimeSeries.trendFitTime(df, "k", "ts", "v", origin)
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    // split into 4 arbitrary chunks, stats per chunk, union, merge
    val parts = rows.grouped(37).map(ch =>
      TimeSeries.trendStatsTime(ch.toDF("k", "ts", "v"), "k", "ts", "v", origin))
      .reduce(_ unionByName _)
    val merged = TimeSeries.trendFromStats(parts, "k")
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(merged == whole)
    // and the fit is exact: constant series -> slope_num 0
    val const = (1 to 5).map(i =>
      ("c", new java.sql.Timestamp(1704067200000L + i * 1000), 2.5)).toDF("k", "ts", "v")
    val r = TimeSeries.trendFitTime(const, "k", "ts", "v", origin).collect().head
    assert(BigDecimal(r.getDecimal(2)) == 0 &&
      BigDecimal(r.getDecimal(3)) / BigDecimal(r.getDecimal(4)) == BigDecimal(2500000))
  }

  test("cusumChangePoint: locates a planted level shift, exact statistic") {
    // key "a": 10 rows at 1.0, then 10 rows at 5.0 — the CUSUM magnitude
    // peaks at the last low row (position 10)
    val rows = ((1 to 10).map(i => ("a", i.toLong, i.toLong, 1.0)) ++
      (11 to 20).map(i => ("a", i.toLong, i.toLong, 5.0)) ++
      Seq(("b", 1L, 1L, 2.0), ("b", 2L, 2L, 2.0))) // flat series
      .toDF("k", "ts", "id", "v")
    val got = TimeSeries.cusumChangePoint(rows, "k", "ts", "id", "v")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // units: 1e6 and 5e6; n=20, T=60e6; at k=10: S=10e6,
    // |n*S - k*T| = |200e6 - 600e6| = 400e6 — the max
    assert(got("a") == ("a", 10L, 10L, 400000000L, 20L))
    // flat series: every cusum is 0, tie broken by earliest (ts, id)
    assert(got("b") == ("b", 1L, 1L, 0L, 2L))
    // driver-side replay on a seeded random series
    val rnd = new scala.util.Random(0xC05A31L)
    val vs = Seq.fill(40)(rnd.nextInt(1000) / 100.0)
    val df = vs.zipWithIndex.map { case (v, i) => ("r", i.toLong, i.toLong, v) }
      .toDF("k", "ts", "id", "v")
    val us = vs.map(v => math.floor(v * 1000000 + 0.5).toLong)
    val t = us.sum; val n = us.length.toLong
    val cx = us.scanLeft(0L)(_ + _).tail.zipWithIndex
      .map { case (s, i) => (math.abs(n * s - (i + 1) * t), i.toLong) }
    val best = cx.maxBy(p => (p._1, -p._2))
    val gr = TimeSeries.cusumChangePoint(df, "k", "ts", "id", "v")
      .as[(String, Long, Long, Long, Long)].head()
    assert((gr._4, gr._2) == (best._1, best._2),
      s"replay mismatch: got $gr want $best")
  }
}
