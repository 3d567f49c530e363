package graft.ops

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class DimensionSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // a small change log: key 1 changes A→B→B(restated)→C, key 2 never
  // changes after its first row, key 3 has a single row
  private def log: DataFrame = Seq(
    (1L, d("2020-01-01"), "A"),
    (1L, d("2020-02-01"), "B"),
    (1L, d("2020-03-01"), "B"), // restated — must NOT split the interval
    (1L, d("2020-04-01"), "C"),
    (2L, d("2020-01-15"), "X"),
    (2L, d("2020-06-15"), "X"), // restated
    (3L, d("2020-05-01"), "Q")
  ).toDF("k", "ts", "attr")

  private def collect(df: DataFrame): Seq[(Long, String, Date, Option[Date], Boolean)] =
    df.select($"k", $"attr", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, Date, Option[Date], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime)).toSeq

  test("scd2Build: change points, half-open intervals, restated values collapse") {
    val dim = collect(Dimension.scd2Build(log, "k", "ts", Seq("attr")))
    assert(dim == Seq(
      (1L, "A", d("2020-01-01"), Some(d("2020-02-01")), false),
      (1L, "B", d("2020-02-01"), Some(d("2020-04-01")), false), // spans the restatement
      (1L, "C", d("2020-04-01"), None, true),
      (2L, "X", d("2020-01-15"), None, true),
      (3L, "Q", d("2020-05-01"), None, true)))
  }

  test("scd2Apply equals a from-scratch rebuild over the full log") {
    val split = d("2020-03-15")
    val dim0 = Dimension.scd2Build(log.filter($"ts" < split), "k", "ts", Seq("attr"))
    val applied = Dimension.scd2Apply(dim0, log.filter($"ts" >= split),
      "k", "ts", Seq("attr"))
    val full = Dimension.scd2Build(log, "k", "ts", Seq("attr"))
    assert(collect(applied) == collect(full))
  }

  test("scd2Apply: unaffected keys and closed rows pass through untouched") {
    val split = d("2020-03-15")
    val dim0 = Dimension.scd2Build(log.filter($"ts" < split), "k", "ts", Seq("attr"))
    // batch touches only key 1
    val batch = log.filter($"ts" >= split && $"k" === 1L)
    val applied = Dimension.scd2Apply(dim0, batch, "k", "ts", Seq("attr"))
    // key 2's pre-split dimension row survives bit-for-bit (still current:
    // its post-split restatement never arrived)
    assert(collect(applied.filter($"k" === 2L)) ==
      collect(dim0.filter($"k" === 2L)))
    // key 1's closed row (A) is identical to its pre-apply form
    assert(collect(applied.filter($"k" === 1L && !$"is_current" && $"attr" === "A")) ==
      collect(dim0.filter($"k" === 1L && $"attr" === "A")))
  }

  test("scd2Apply: a batch restating the current value adds no row") {
    val dim0 = Dimension.scd2Build(log, "k", "ts", Seq("attr"))
    val restate = Seq((2L, d("2021-01-01"), "X")).toDF("k", "ts", "attr")
    val applied = Dimension.scd2Apply(dim0, restate, "k", "ts", Seq("attr"))
    assert(collect(applied) == collect(dim0))
  }

  test("q87 shape on real data: apply-then-read equals full-log rebuild") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("o_orderdate", $"o_orderdate".cast("date"))
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max_by($"o_orderstatus", $"o_orderkey").as("st"))
      .withColumnRenamed("o_custkey", "k")
      .withColumnRenamed("o_orderdate", "ts")
      .withColumnRenamed("st", "attr")
    val split = d("1997-01-01")
    val applied = Dimension.scd2Apply(
      Dimension.scd2Build(orders.filter($"ts" < split), "k", "ts", Seq("attr")),
      orders.filter($"ts" >= split), "k", "ts", Seq("attr"))
    val full = Dimension.scd2Build(orders, "k", "ts", Seq("attr"))
    assert(collect(applied) == collect(full))
    // interval sanity: per key, exactly one current row; valid_to of each
    // closed row equals the next row's valid_from
    val rows = collect(full)
    rows.groupBy(_._1).foreach { case (_, hist) =>
      assert(hist.count(_._5) == 1)
      hist.sliding(2).foreach {
        case Seq(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
    }
  }

  test("pitJoin: inclusive valid_from, latest version wins, " +
    "pre-history facts get NULL, plan has no join node") {
    import spark.implicits._
    def d(s: String) = Date.valueOf(s)
    // key 1: versions A@jan B@mar; key 2: one version X@feb
    val changes = Seq(
      (1L, d("2024-01-01"), "A"), (1L, d("2024-03-01"), "B"),
      (2L, d("2024-02-01"), "X")
    ).toDF("k", "ts", "v")
    val dim = Dimension.scd2Build(changes, "k", "ts", Seq("v"))
      .withColumnRenamed("v", "v_at")
    val facts = Seq(
      (10L, 1L, d("2023-12-31")), // before first version -> NULL
      (11L, 1L, d("2024-01-01")), // exactly at valid_from -> A (inclusive)
      (12L, 1L, d("2024-02-15")), // between versions -> A
      (13L, 1L, d("2024-03-01")), // at the change -> B
      (14L, 1L, d("2024-12-01")), // open current interval -> B
      (15L, 2L, d("2024-05-05"))  // other key -> X
    ).toDF("fid", "k", "t")
    val pit = Dimension.pitJoin(facts, dim, "k", "t", Seq("v_at"))
    val got = pit.select($"fid", $"v_at").as[(Long, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, None), (11L, Some("A")), (12L, Some("A")),
      (13L, Some("B")), (14L, Some("B")), (15L, Some("X"))))
    val plan = pit.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"pitJoin must not plan a join:\n$plan")
  }

  test("pitJoin equals the declarative interval join on the real table") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val log = orders.groupBy($"o_custkey", $"o_orderdate")
      .agg(max_by($"o_orderstatus", $"o_orderkey").as("o_orderstatus"))
    val dim = Dimension.scd2Build(log, "o_custkey", "o_orderdate",
        Seq("o_orderstatus"))
      .withColumnRenamed("o_orderstatus", "status_at_order")
    val facts = orders.select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val pit = Dimension.pitJoin(facts, dim, "o_custkey", "o_orderdate",
        Seq("status_at_order"))
      .select($"o_orderkey", $"status_at_order")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val interval = facts.join(dim,
        facts("o_custkey") === dim("o_custkey") &&
          dim("valid_from") <= facts("o_orderdate") &&
          (dim("valid_to").isNull || facts("o_orderdate") < dim("valid_to")),
        "left")
      .select($"o_orderkey", $"status_at_order")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(pit == interval && pit.nonEmpty)
  }

  test("pitJoinStale: fresh versions equal pitJoin; old versions and no-version keys are NULL") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    val dayUs = 86400L * 1000000L
    val dim = Seq(
      (1L, ts(1), "v1"), (1L, ts(10), "v2"), // key 1: two versions
      (2L, ts(1), "w1"))                     // key 2: one old version
      .toDF("k", "valid_from", "attr")
    val facts = Seq(
      (101L, 1L, ts(11)), // v2 is 1 day old -> fresh
      (102L, 1L, ts(20)), // v2 is 10 days old -> stale under 5-day bound
      (103L, 2L, ts(2)),  // w1 is 1 day old -> fresh
      (104L, 3L, ts(15))) // no version at all -> NULL
      .toDF("fid", "k", "ft")
    val got = Dimension.pitJoinStale(facts, dim, "k", "ft", Seq("attr"),
        maxAgeUs = 5L * dayUs)
      .select($"fid", $"attr").as[(Long, Option[String])].collect().toMap
    assert(got == Map(101L -> Some("v2"), 102L -> None,
      103L -> Some("w1"), 104L -> None))
    // with an unbounded age the stale variant degenerates to pitJoin
    val unbounded = Dimension.pitJoinStale(facts, dim, "k", "ft",
        Seq("attr"), maxAgeUs = 365L * dayUs)
      .select($"fid", $"attr").as[(Long, Option[String])].collect().toMap
    val plain = Dimension.pitJoin(facts, dim, "k", "ft", Seq("attr"))
      .select($"fid", $"attr").as[(Long, Option[String])].collect().toMap
    assert(unbounded == plain)
  }

  test("pitJoinNext: earliest at-or-after version, inclusive equal instant, " +
    "trailing/keyless facts NULL, plan has no join node") {
    import spark.implicits._
    // key 1: versions a@5 b@10; key 2: c@1
    val dim = Seq((1L, 5L, "a"), (1L, 10L, "b"), (2L, 1L, "c"))
      .toDF("k", "valid_from", "nxt")
    val facts = Seq(
      (10L, 1L, 3L),  // before both -> nearest future = a
      (11L, 1L, 5L),  // exactly at a's valid_from -> a (inclusive)
      (12L, 1L, 7L),  // between -> b
      (13L, 1L, 10L), // at b -> b
      (14L, 1L, 11L), // after the last version -> NULL
      (15L, 2L, 5L),  // key 2's only version is in the past -> NULL
      (16L, 3L, 1L)   // key with no versions at all -> NULL
    ).toDF("fid", "k", "t")
    val nxt = Dimension.pitJoinNext(facts, dim, "k", "t", Seq("nxt"))
    val got = nxt.select($"fid", $"nxt").as[(Long, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, Some("a")), (11L, Some("a")), (12L, Some("b")),
      (13L, Some("b")), (14L, None), (15L, None), (16L, None)))
    val plan = nxt.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"pitJoinNext must not plan a join:\n$plan")
  }

  test("pitJoinNext equals the declarative forward interval join on the real table") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val log = orders.groupBy($"o_custkey", $"o_orderdate")
      .agg(max_by($"o_orderstatus", $"o_orderkey").as("o_orderstatus"))
    val dim = Dimension.scd2Build(log, "o_custkey", "o_orderdate",
        Seq("o_orderstatus"))
      .withColumnRenamed("o_orderstatus", "status_next")
    val facts = orders.select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val fwd = Dimension.pitJoinNext(facts, dim, "o_custkey", "o_orderdate",
        Seq("status_next"))
      .select($"o_orderkey", $"status_next")
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    // declarative replay: min-valid_from version at-or-after each fact
    val nextV = facts.join(dim,
        facts("o_custkey") === dim("o_custkey") &&
          dim("valid_from") >= facts("o_orderdate"), "left")
      .groupBy(facts("o_orderkey").as("ok"))
      .agg(min_by(dim("status_next"), dim("valid_from")).as("sn"))
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(fwd == nextV && fwd.exists(_._2.isDefined) && fwd.exists(_._2.isEmpty))
  }
}
