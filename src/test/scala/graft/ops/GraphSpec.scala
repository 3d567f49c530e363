package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class GraphSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("pageRank on a 2-node cycle converges to equal ranks, mass conserved") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iterations = 10)
      .as[(Long, Long)].collect().toMap
    // symmetric graph: both nodes identical by symmetry at every iteration
    assert(r(1L) == r(2L))
    // each node's rank stays ~1.0 (teleport + damped full inheritance);
    // integer truncation loses at most a few units per iteration
    assert(math.abs(r(1L) - Graph.SCALE) < 100L, r.toString)
  }

  test("star + chain: rank flows along edges, teleport-only spokes tie") {
    // spokes 3..5 point at hub 1; hub forwards everything to 2. The
    // spokes get teleport only (no in-edges); the hub aggregates their
    // mass; 2 inherits the hub's ENTIRE damped rank and ends highest.
    val edges = (3L to 5L).map(s => (s, 1L)).toDF("src", "dst")
      .unionAll(Seq((1L, 2L)).toDF("src", "dst"))
    val r = Graph.pageRank(edges, "src", "dst", iterations = 10)
      .as[(Long, Long)].collect().toMap
    assert(r(2L) > r(1L) && r(1L) > r(3L), r.toString)
    assert(r(3L) == r(4L) && r(4L) == r(5L), "symmetric spokes must tie")
    assert(r(3L) == (100L - 85L) * Graph.SCALE / 100L, "teleport-only spoke")
  }

  test("rank-strategy selection: broadcast iff |V| <= broadcastMaxNodes, " +
    "forced override wins") {
    assert(Graph.chooseRankStrategy(1000000L, 1000000L, None))
    assert(!Graph.chooseRankStrategy(1000001L, 1000000L, None))
    assert(!Graph.chooseRankStrategy(10L, 1000000L, Some(false)))
    assert(Graph.chooseRankStrategy(10000000000L, 1000000L, Some(true)))
  }

  test("broadcast and shuffle rank paths are bit-identical") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val edges = li.select(($"l_suppkey" * 2 + 1).as("src"), ($"l_partkey" * 2).as("dst"))
    val b = Graph.pageRank(edges, "src", "dst", iterations = 3,
      broadcastRanks = Some(true)).as[(Long, Long)].collect().sorted.toSeq
    val s = Graph.pageRank(edges, "src", "dst", iterations = 3,
      broadcastRanks = Some(false)).as[(Long, Long)].collect().sorted.toSeq
    assert(b == s && b.nonEmpty)
  }

  test("deterministic under repartitioning (integer arithmetic, no FP order)") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    def edges(parts: Int) = {
      val fwd = li.select(($"l_suppkey" * 2 + 1).as("src"), ($"l_partkey" * 2).as("dst"))
      val rev = li.select(($"l_partkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      fwd.unionAll(rev).repartition(parts)
    }
    val a = Graph.pageRank(edges(3), "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val b = Graph.pageRank(edges(11), "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
