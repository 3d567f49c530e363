package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class SkipIndexSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshPath() =
    java.nio.file.Files.createTempDirectory("skipidx").toString + "/tbl"

  // (shard, key, payload): key 999 lives ONLY in shard 2
  private val rows = Seq(
    (1L, 10L, "a"), (1L, 11L, "b"),
    (2L, 999L, "c"), (2L, 10L, "d"),
    (3L, 12L, "e"), (4L, 13L, "f"))

  test("pruned read equals the plain filter; rare key prunes to its one shard") {
    val p = freshPath()
    val df = rows.toDF("s", "k", "v")
    SkipIndex.write(df, p, "s", "k")
    // with 65536 bits over ≤ 2 keys/shard this seed family has no false
    // positives on this data — the rare key's candidate list is exact
    assert(SkipIndex.candidateShards(spark, p, Seq(999L),
      SkipIndex.DefaultBits) == Seq(2L))
    val got = SkipIndex.readPruned(spark, p, "k", Seq(999L))
      .select($"k", $"v").as[(Long, String)].collect().toSet
    assert(got == Set((999L, "c")))
    // multi-key lookup across shards
    val multi = SkipIndex.readPruned(spark, p, "k", Seq(10L, 13L))
      .select($"s", $"k", $"v").as[(Long, Long, String)].collect().toSet
    assert(multi == Set((1L, 10L, "a"), (2L, 10L, "d"), (4L, 13L, "f")))
  }

  test("duplicate probe keys do not break the all-bits admit test") {
    val p = freshPath()
    SkipIndex.write(rows.toDF("s", "k", "v"), p, "s", "k")
    // pre-fix, a duplicated key doubled its (row, bit) hits and the
    // hits === Hashes admit test rejected every shard — silent data loss
    val got = SkipIndex.readPruned(spark, p, "k", Seq(999L, 999L))
      .select($"k", $"v").as[(Long, String)].collect().toSet
    assert(got == Set((999L, "c")))
  }

  test("a key absent from every shard reads zero rows (and zero shards)") {
    val p = freshPath()
    SkipIndex.write(rows.toDF("s", "k", "v"), p, "s", "k")
    assert(SkipIndex.candidateShards(spark, p, Seq(777777L),
      SkipIndex.DefaultBits).isEmpty)
    assert(SkipIndex.readPruned(spark, p, "k", Seq(777777L)).count() == 0L)
  }

  test("a probe set past InPredicateMaxKeys takes the semi-join path, identical results") {
    val p = freshPath()
    val big = (1L to 2000L).map(i => (i % 8, i, s"v$i"))
    SkipIndex.write(big.toDF("s", "k", "v"), p, "s", "k")
    // 800 distinct probe keys (> 256): the exact predicate must switch
    // from an inlined IN list to a broadcast LEFT SEMI join — a 10^5-key
    // caller would otherwise blow up the plan tree (VERDICT r11 #2).
    // Every third key plus a block of absent ones; result must equal
    // the plain filter exactly, duplicates in the probe set and all.
    val probes = (1L to 2000L by 3L) ++ (900000L to 900100L) ++ Seq(3L, 3L)
    assert(probes.distinct.size > SkipIndex.InPredicateMaxKeys)
    val got = SkipIndex.readPruned(spark, p, "k", probes)
      .select($"k", $"v").as[(Long, String)].collect().toSet
    val want = big.toDF("s", "k", "v").filter($"k".isin(probes.distinct: _*))
      .select($"k", $"v").as[(Long, String)].collect().toSet
    assert(got == want && got.nonEmpty)
    // plan carries no giant In predicate on the data side
    val plan = SkipIndex.readPruned(spark, p, "k", probes)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") || plan.contains("SemiJoin"))
  }

  test("false positives never surface rows: tiny filter, exact results anyway") {
    val p = freshPath()
    // 64 bits with 20 keys/shard: heavily saturated — most lookups are
    // false-positive admitted, but the exact predicate keeps results right
    val big = (1L to 80L).map(i => (i % 4, i, s"v$i"))
    SkipIndex.write(big.toDF("s", "k", "v"), p, "s", "k", bits = 64)
    val got = SkipIndex.readPruned(spark, p, "k", Seq(7L, 999L), bits = 64)
      .select($"k").as[Long].collect().toSet
    assert(got == Set(7L))
  }
}
