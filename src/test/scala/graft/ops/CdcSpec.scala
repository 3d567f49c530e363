package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class CdcSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select($"k", $"change", array_join($"changed_cols", ",").as("cc"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq

  test("insert / delete / update / unchanged classified correctly") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val after = Seq((2L, "b", 20.0), (3L, "C", 31.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val d = collect(Cdc.snapshotDiff(before, after, Seq("k"), Seq("s", "v")))
    assert(d == Seq(
      (1L, "delete", ""),
      (3L, "update", "s,v"),
      (4L, "insert", "")))
  }

  test("null transitions count as changes, null-to-null does not") {
    val before = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("k", "s")
    val after = Seq((1L, Option.empty[String]), (2L, Option("x")),
      (3L, Option.empty[String])).toDF("k", "s")
    val d = collect(Cdc.snapshotDiff(before, after, Seq("k"), Seq("s")))
    assert(d == Seq((1L, "update", "s"), (2L, "update", "s")))
  }

  test("diff of identical snapshots is empty") {
    val snap = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey".as("k"), $"o_orderstatus".as("s"), $"o_totalprice".as("v"))
    assert(Cdc.snapshotDiff(snap, snap, Seq("k"), Seq("s", "v")).isEmpty)
  }

  test("bucketed snapshots diff with zero Exchange (co-located full-outer)") {
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val o = spark.read.parquet(s"$sf0001/orders.parquet")
        .select($"o_orderkey".as("k"), $"o_orderstatus".as("s"), $"o_totalprice".as("v"))
      val before = o.filter($"k" % 7 =!= 0)
      val after = o.filter($"k" % 11 =!= 0)
        .withColumn("v", when($"k" % 5 === 0, $"v" + 1.0).otherwise($"v"))
      graft.io.Lake.writeBucketed(before, "cdc_before", "k", 4, Some("k"))
      graft.io.Lake.writeBucketed(after, "cdc_after", "k", 4, Some("k"))

      val diff = Cdc.snapshotDiff(spark.table("cdc_before"),
        spark.table("cdc_after"), Seq("k"), Seq("s", "v"))
      val plan = diff.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed snapshot diff must not shuffle; plan was:\n$plan")

      // and the co-located diff is still the diff
      val expected = collect(Cdc.snapshotDiff(before, after, Seq("k"), Seq("s", "v")))
      assert(collect(diff) == expected && expected.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.sql("DROP TABLE IF EXISTS cdc_before")
      spark.sql("DROP TABLE IF EXISTS cdc_after")
    }
  }

  test("real-table diff: output is |changes|, classes partition the keys") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey".as("k"), $"o_orderstatus".as("s"), $"o_totalprice".as("v"))
    val before = o.filter($"k" % 7 =!= 0)
    val after = o.filter($"k" % 11 =!= 0)
      .withColumn("v", when($"k" % 5 === 0, $"v" + 1.0).otherwise($"v"))
    val d = Cdc.snapshotDiff(before, after, Seq("k"), Seq("s", "v"))
      .groupBy("change").count().as[(String, Long)].collect().toMap
    val n = o.count()
    val expInserts = o.filter($"k" % 7 === 0 && $"k" % 11 =!= 0).count()
    val expDeletes = o.filter($"k" % 11 === 0 && $"k" % 7 =!= 0).count()
    val expUpdates = o.filter($"k" % 5 === 0 && $"k" % 7 =!= 0 && $"k" % 11 =!= 0).count()
    assert(d.getOrElse("insert", 0L) == expInserts, s"$d vs n=$n")
    assert(d.getOrElse("delete", 0L) == expDeletes, d.toString)
    assert(d.getOrElse("update", 0L) == expUpdates, d.toString)
  }
}
