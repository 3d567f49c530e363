package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class JoinOpsSpec extends AnyFunSuite with SparkTest {

  test("bandedRangeJoin equals the naive non-equi join") {
    import spark.implicits._
    val ev = graft.queries.Queries.normalizeTs(
      spark.read.parquet(s"$sf0001/events.parquet"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("cid"), col("ts").as("cts"))

    val banded = RangeJoin.bandedRangeJoin(p, c, "user_id", "pts", "cts",
        loMs = -3600000L, hiMs = 0L, bandMs = 3600000L)
      .select($"pid", $"cid").as[(Long, Long)].collect().toSet

    val naive = p.join(c, Seq("user_id"))
      .filter(unix_micros($"cts") >= unix_micros($"pts") - 3600000000L &&
        unix_micros($"cts") < unix_micros($"pts"))
      .select($"pid", $"cid").as[(Long, Long)].collect().toSet

    assert(naive.nonEmpty, "fixture must produce at least one in-range pair")
    assert(banded == naive)
  }

  test("bandedRangeJoin keeps microsecond precision at the interval bounds") {
    import spark.implicits._
    def ts(us: Long) = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    val baseUs = 1700000000000000L
    val l = Seq((1L, ts(baseUs + 900))).toDF("k", "lts") // +900µs past the ms
    val r = Seq(
      (1L, 201L, ts(baseUs + 100)), // 800µs before left: in [lo, hi)
      (1L, 202L, ts(baseUs + 900)), // == left: excluded by hi (half-open)
      (1L, 203L, ts(baseUs - 3600000000L + 899L)) // 1µs before lo: out
    ).toDF("k", "rid", "rts")
    val got = RangeJoin.bandedRangeJoin(l, r, "k", "lts", "rts",
        -3600000L, 0L, 3600000L)
      .select($"rid").as[Long].collect().toSet
    assert(got == Set(201L))
  }

  test("bandedRangeJoin half-open bounds: hit at lo, miss at hi") {
    import spark.implicits._
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("k", "lts")
    val r = Seq(
      (1L, 101L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00")), // == lo: in
      (1L, 102L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")), // == hi: out
      (1L, 103L, java.sql.Timestamp.valueOf("2024-01-01 08:59:59.999")) // < lo: out
    ).toDF("k", "rid", "rts")
    val got = RangeJoin.bandedRangeJoin(l, r, "k", "lts", "rts",
        -3600000L, 0L, 3600000L)
      .select($"rid").as[Long].collect().toSet
    assert(got == Set(101L))
  }

  test("bandedRangeJoin equals naive across randomized offsets and bands") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xBA4D5EED)
    val base = 1700000000000L
    val left = (1 to 120).map(i =>
      (rnd.nextInt(5).toLong, i.toLong,
        new java.sql.Timestamp(base + rnd.nextInt(86400000))))
      .toDF("k", "lid", "lts")
    val right = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, i.toLong,
        new java.sql.Timestamp(base + rnd.nextInt(86400000))))
      .toDF("k", "rid", "rts")
    // (loMs, hiMs, bandMs): lookback, lookahead, asymmetric, odd band size
    val cases = Seq(
      (-3600000L, 0L, 3600000L),
      (0L, 1800000L, 900000L),
      (-7200000L, 3600000L, 5400000L),
      (-1234567L, 765432L, 999999L))
    cases.foreach { case (lo, hi, band) =>
      val banded = graft.ops.RangeJoin
        .bandedRangeJoin(left, right, "k", "lts", "rts", lo, hi, band)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      val naive = left.join(right, Seq("k"))
        .filter(unix_micros($"rts") >= unix_micros($"lts") + lo * 1000 &&
          unix_micros($"rts") < unix_micros($"lts") + hi * 1000)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      assert(banded == naive, s"case (lo=$lo, hi=$hi, band=$band)")
      assert(naive.nonEmpty, s"degenerate case (lo=$lo, hi=$hi, band=$band)")
    }
  }

  test("saltedJoin is row-identical to the plain join") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"))
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salted = Skew.saltedJoin(li, o, "l_orderkey", col("l_linenumber"), 8)
    val plain = li.join(o, Seq("l_orderkey"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin left/semi/anti equal their plain counterparts; right-outer rejected") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"))
      // shift half the keys out of range so outer/anti actually fire
      .withColumn("l_orderkey",
        when(col("l_orderkey") % 2 === 0, col("l_orderkey") + 10000000L)
          .otherwise(col("l_orderkey")))
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    for (jt <- Seq("left", "left_semi", "left_anti")) {
      val salted = Skew.saltedJoin(li, o, "l_orderkey", col("l_linenumber"), 8, jt)
      val plain = li.join(o, Seq("l_orderkey"), jt)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"joinType $jt diverged")
      assert(plain.count() > 0, s"degenerate fixture for $jt")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(li, o, "l_orderkey", col("l_linenumber"), 8, "right_outer")
    }
  }

  test("saltedJoin spreads a hot key over multiple partitions' sub-keys") {
    import spark.implicits._
    // one pathological key: 1000 rows on the left, 1 dim row on the right
    val hot = (1 to 1000).map(i => (42L, i.toLong)).toDF("k", "line")
    val dim = Seq((42L, "x")).toDF("k", "name")
    val salted = Skew.saltedJoin(hot, dim, "k", $"line", 8)
    assert(salted.count() == 1000)
    // the salt assignment must actually use more than one sub-key
    val nSalts = hot.select(pmod(xxhash64($"line"), lit(8)).as("s"))
      .distinct().count()
    assert(nSalts > 1)
  }
}
