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
