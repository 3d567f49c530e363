package graft.ops

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class MaterializeSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def frame(tag: Int) =
    Seq.tabulate(10)(i => (tag.toLong * 100 + i, s"doc-$tag-$i"))
      .toDF("id", "txt").filter($"id" >= 0) // distinct plan per tag

  test("alternating corpora both stay cached; a fourth evicts the LRU; no leak") {
    val slot = s"spec-slot-${System.nanoTime()}"
    val (a, b, c, d) = (frame(1), frame(2), frame(3), frame(4))
    Materialize.cachedSingleton(slot, a)
    Materialize.cachedSingleton(slot, b)
    // alternate back to a: must be a HIT (a still persisted, no rebuild)
    Materialize.cachedSingleton(slot, a)
    assert(a.storageLevel != StorageLevel.NONE, "a was evicted by alternation")
    assert(b.storageLevel != StorageLevel.NONE)
    Materialize.cachedSingleton(slot, c)
    assert(Materialize.liveCount(slot) == 3)
    // fourth corpus evicts the least-recently-used entry (b: a was
    // re-touched after b, c/d are newer)
    Materialize.cachedSingleton(slot, d)
    assert(Materialize.liveCount(slot) == 3, "slot must stay bounded")
    assert(b.storageLevel == StorageLevel.NONE, "LRU entry must be unpersisted")
    assert(a.storageLevel != StorageLevel.NONE)
    assert(c.storageLevel != StorageLevel.NONE)
    assert(d.storageLevel != StorageLevel.NONE)
    // same-plan re-cache is a hit, not a new entry
    Materialize.cachedSingleton(slot, frame(4))
    assert(Materialize.liveCount(slot) == 3)
    Materialize.clearAll()
    assert(Materialize.liveCount(slot) == 0)
    assert(d.storageLevel == StorageLevel.NONE, "clearAll must unpersist")
  }

  test("generation bumps on clearAll and on external clearCache") {
    val g0 = Materialize.generation(spark)
    assert(Materialize.generation(spark) == g0, "stable when nothing cleared")
    Materialize.clearAll()
    val g1 = Materialize.generation(spark)
    assert(g1 > g0)
    spark.catalog.clearCache() // external clear drops the sentinel too
    val g2 = Materialize.generation(spark)
    assert(g2 > g1, "external clearCache must be detected as a new generation")
  }
}
