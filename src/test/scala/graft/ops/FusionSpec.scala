package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class FusionSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def rk(rows: (Long, Long, Long)*) =
    rows.toDF("qid", "id", "rnk")

  test("rrfFuse: hand-computed integer scores, overlap sums, ties by id") {
    val a = rk((1L, 100L, 1L), (1L, 200L, 2L), (1L, 300L, 3L))
    val b = rk((1L, 200L, 1L), (1L, 400L, 2L))
    val out = Fusion.rrfFuse(Seq(a, b), topK = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._2)
    def r(rank: Long) = Fusion.RrfScale / (60L + rank)
    // 200 is in both lists: 1/(60+2) + 1/(60+1)
    val expected = Map(
      100L -> (r(1), 1L), 200L -> (r(2) + r(1), 2L),
      300L -> (r(3), 1L), 400L -> (r(2), 1L))
    val byId = out.map(x => x._3 -> (x._4, x._5)).toMap
    assert(byId == expected)
    // ranking: 200 (two lists) first, then 100, then 300/400 tie on
    // score r(3)==r(3)? no: 300 has r(3)=16129032, 400 has r(2)=16393442
    val ranked = out.sortBy(_._2).map(_._3)
    assert(out.find(_._3 == 200L).get._2 == 1L)
    assert(out.find(_._3 == 100L).get._2 == 2L)
    assert(out.find(_._3 == 400L).get._2 == 3L)
    assert(out.find(_._3 == 300L).get._2 == 4L)
    assert(ranked.size == 4)
  }

  test("rrfFuse: equal scores break ties by id asc; topK cuts") {
    // two docs each rank-1 in exactly one list -> equal rrf, id decides
    val a = rk((7L, 900L, 1L))
    val b = rk((7L, 800L, 1L))
    val out = Fusion.rrfFuse(Seq(a, b), topK = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((7L, 1L, 800L, Fusion.RrfScale / 61L, 1L)))
  }

  test("rrfFuse keeps queries independent") {
    val a = rk((1L, 10L, 1L), (2L, 20L, 1L))
    val out = Fusion.rrfFuse(Seq(a), topK = 5)
      .select($"qid", $"rnk", $"id").as[(Long, Long, Long)].collect().toSeq.sorted
    assert(out == Seq((1L, 1L, 10L), (2L, 1L, 20L)))
  }
}
