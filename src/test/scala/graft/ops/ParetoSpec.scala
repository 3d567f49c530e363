package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class ParetoSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def brute(pts: Seq[(Double, Long)]): Set[(Double, Long)] = {
    val d = pts.distinct
    d.filter { case (px, py) =>
      !d.exists { case (qx, qy) =>
        qx <= px && qy >= py && (qx < px || qy > py)
      }
    }.toSet
  }

  test("skyline equals the brute-force dominance check (random points)") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(300)((rnd.nextInt(50).toDouble, rnd.nextInt(50).toLong))
    for (salts <- Seq(1, 4, 32)) {
      val got = Pareto.skyline2D(pts.toDF("px", "py"), $"px", $"py", salts)
        .select($"x", $"y").as[(Double, Long)].collect().toSet
      assert(got == brute(pts), s"salts=$salts")
    }
  }

  test("counts, equal-x domination, staircase worst case, nulls dropped") {
    // staircase: perfectly anti-correlated -> every point is frontier
    val stair = Seq((1.0, 5L), (2.0, 6L), (3.0, 7L))
    val s = Pareto.skyline2D(stair.toDF("px", "py"), $"px", $"py")
      .as[(Double, Long, Long)].collect().toSet
    assert(s == Set((1.0, 5L, 1L), (2.0, 6L, 1L), (3.0, 7L, 1L)))
    // duplicates counted; equal-x lower-y dominated; null rows dropped
    val pts = Seq[(java.lang.Double, java.lang.Long)](
      (1.0, 5L), (1.0, 5L), (1.0, 3L), (2.0, 5L), (null, 9L), (9.0, null))
    val got = Pareto.skyline2D(pts.toDF("px", "py"), $"px", $"py")
      .as[(Double, Long, Long)].collect().toSet
    assert(got == Set((1.0, 5L, 2L)))
  }
}
