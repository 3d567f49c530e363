package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class RecsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("coVisitation: hand-computed counts and top-k order") {
    // baskets: 1:{10,20,30}  2:{10,20}  3:{10,40}  (4 is a singleton)
    val items = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 40L),
      (4L, 50L)).toDF("bk", "it")
    val got = Recs.coVisitation(items, "bk", "it", k = 2)
      .orderBy($"part", $"cooc".desc, $"rec")
      .as[(Long, Long, Long)].collect().toSeq
    // pair counts: (10,20)=2 (10,30)=1 (20,30)=1 (10,40)=1
    assert(got == Seq(
      (10L, 20L, 2L), (10L, 30L, 1L), // part 10: 20 beats 30/40; 30 beats 40 on id
      (20L, 10L, 2L), (20L, 30L, 1L),
      (30L, 10L, 1L), (30L, 20L, 1L),
      (40L, 10L, 1L)))
    // the singleton item 50 has no co-visits and must not appear
    assert(!got.exists(_._1 == 50L))
  }

  test("duplicate items within a basket count once") {
    val items = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L))
      .toDF("bk", "it")
    val got = Recs.coVisitation(items, "bk", "it", k = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 20L, 2L), (20L, 10L, 2L)))
  }

  test("maxBasket slices to the lowest item ids before pair generation") {
    val items = Seq((1L, 30L), (1L, 10L), (1L, 20L), (1L, 40L))
      .toDF("bk", "it")
    val got = Recs.coVisitation(items, "bk", "it", k = 5, maxBasket = 2)
      .as[(Long, Long, Long)].collect().toSet
    // only {10,20} survive the slice — one pair
    assert(got == Set((10L, 20L, 1L), (20L, 10L, 1L)))
  }

  test("durable co-visit index: serve equals the in-session mine; plan is exchange-free") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    try {
      Recs.writeCoVisitIndex(li, "l_orderkey", "l_partkey",
        "covisit_spec", buckets = 4)
      val served = Recs.serveCoVisitTopK(spark, "covisit_spec", k = 5)
      // the whole serve — placed scan + partial/final top-k — moves no data
      val plan = served.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"serve must be exchange-free off the bucketed index; plan was:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"serve must read the placed bucketed scan; plan was:\n$plan")
      val a = served.orderBy($"part", $"cooc".desc, $"rec")
        .as[(Long, Long, Long)].collect().toSeq
      val b = Recs.coVisitation(li, "l_orderkey", "l_partkey", k = 5)
        .orderBy($"part", $"cooc".desc, $"rec")
        .as[(Long, Long, Long)].collect().toSeq
      assert(a == b && a.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS covisit_spec")
  }

  test("incremental append: build(first)+append(rest) equals build(whole)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // split on basket id — baskets must not span append calls (contract)
    val first = li.filter($"l_orderkey" % 3 =!= 0)
    val rest = li.filter($"l_orderkey" % 3 === 0)
    try {
      Recs.writeCoVisitIndex(first, "l_orderkey", "l_partkey",
        "covisit_inc", buckets = 4)
      Recs.appendToCoVisitIndex(rest, "covisit_inc", "l_orderkey",
        "l_partkey", buckets = 4)
      Recs.writeCoVisitIndex(li, "l_orderkey", "l_partkey",
        "covisit_full", buckets = 4)
      val inc = spark.table("covisit_inc")
        .as[(Long, Long, Long)].collect().toSet
      val full = spark.table("covisit_full")
        .as[(Long, Long, Long)].collect().toSet
      assert(inc == full && inc.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS covisit_inc")
      spark.sql("DROP TABLE IF EXISTS covisit_full")
    }
  }

  test("bounded-exchange operator equals the window top-k formulation") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val a = Recs.coVisitation(li, "l_orderkey", "l_partkey", k = 5)
      .orderBy($"part", $"cooc".desc, $"rec")
      .as[(Long, Long, Long)].collect().toSeq
    val b = Recs.coVisitationWindow(li, "l_orderkey", "l_partkey", k = 5)
      .orderBy($"part", $"cooc".desc, $"rec")
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
