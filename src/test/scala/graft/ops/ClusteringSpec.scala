package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class ClusteringSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def emb(units: (Long, Seq[Long])*) =
    units.map { case (id, u) =>
      (id, u.map(_.toDouble / Clustering.SCALE.toDouble).toArray)
    }.toDF("vec_id", "embedding")

  private def run(df: org.apache.spark.sql.DataFrame, k: Int, rounds: Int) =
    Clustering.kmeansFixedPoint(df, k, rounds)
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("kmeans: hand-computed rounds incl. truncating division on negative sums") {
    // units: v0=(0,0) v1=(4,0) v2=(10,0) v3=(-5,-5); seeds c0=v0, c1=v1
    // r1: {v0,v3}->c0, {v1,v2}->c1; c0=(-5 div 2, -5 div 2)=(-2,-2)
    // (toward-zero truncation, NOT floor), c1=(7,0)
    // r2: same memberships; converged
    // final: c0 n=2 wss=8+18=26 ccheck=-2*1 + -2*2 = -6
    //        c1 n=2 wss=9+9=18  ccheck=7
    val d = emb(0L -> Seq(0L, 0L), 1L -> Seq(4L, 0L),
      2L -> Seq(10L, 0L), 3L -> Seq(-5L, -5L))
    assert(run(d, k = 2, rounds = 2) ==
      Seq((0L, 2L, 26L, -6L), (1L, 2L, 18L, 7L)))
  }

  test("kmeans: equidistant point goes to the LOWEST cluster id") {
    // v2=(2,0) is distance 4 from both seeds -> cluster 0
    // r1 update: c0=mean(v0,v2)=(1,0), c1=(4,0)
    // final assign: v0,v2 -> c0 (wss 1+1), v1 -> c1 (wss 0)
    val d = emb(0L -> Seq(0L, 0L), 1L -> Seq(4L, 0L), 2L -> Seq(2L, 0L))
    assert(run(d, k = 2, rounds = 1) ==
      Seq((0L, 2L, 2L, 1L), (1L, 1L, 0L, 4L)))
  }

  test("kmeans: an emptied cluster carries its centroid and can re-capture") {
    // duplicate seeds: everything ties to cluster 0 in round 1, cluster 1
    // goes empty and CARRIES (0,0); c0 moves to (2,0) — in the final
    // assignment the carried centroid wins v0/v1 back
    val d = emb(0L -> Seq(0L, 0L), 1L -> Seq(0L, 0L), 2L -> Seq(6L, 0L))
    assert(run(d, k = 2, rounds = 1) ==
      Seq((0L, 1L, 16L, 2L), (1L, 2L, 0L, 0L)))
  }

  test("kmeans: empty corpus clusters nothing; k larger than corpus works") {
    assert(run(emb(), k = 3, rounds = 2).isEmpty)
    // 2 vectors, k=3: only 2 seed centroids exist (limit k on 2 rows)
    val d = emb(0L -> Seq(0L, 0L), 1L -> Seq(10L, 0L))
    val got = run(d, k = 3, rounds = 1)
    assert(got.map(_._1) == Seq(0L, 1L) && got.map(_._2) == Seq(1L, 1L))
  }

  test("kmeans: quantization matches the 1e-6 toUnits convention") {
    // 0.0000025 -> floor(2.5 + 0.5) = 3 units; -0.0000025 -> floor(-2.0) = -2
    val d = Seq((0L, Array(0.0000025, -0.0000025)),
      (1L, Array(0.0, 0.0))).toDF("vec_id", "embedding")
    val got = run(d, k = 1, rounds = 1)
    // single cluster: centroid = ((3 + 0) div 2, (-2 + 0) div 2) = (1, -1)
    // ccheck = 1*1 + -1*2 = -1; wss under c=(1,-1): v0 (3-1)^2+(-2+1)^2=5,
    // v1 1+1=2 -> 7
    assert(got == Seq((0L, 2L, 7L, -1L)))
  }
}
