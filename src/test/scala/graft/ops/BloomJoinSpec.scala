package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class BloomJoinSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private def deny = docs.filter($"doc_id" % 13 === 0).select($"doc_id")

  test("bloom anti join is bit-identical to the plain anti join") {
    val fast = BloomJoin.antiJoin(docs, deny, "doc_id", "doc_id", 1000L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val exact = docs.join(deny, Seq("doc_id"), "left_anti")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(fast == exact && exact.nonEmpty)
  }

  test("bloom semi join is bit-identical to the plain semi join") {
    val fast = BloomJoin.semiJoin(docs, deny, "doc_id", "doc_id", 1000L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val exact = docs.join(deny, Seq("doc_id"), "left_semi")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(fast == exact && exact.nonEmpty)
  }

  test("NULL keys survive the anti join and are dropped by the semi join," +
    " matching the plain joins") {
    val withNulls = docs
      .withColumn("doc_id",
        when($"doc_id" % 7 === 0, lit(null)).otherwise($"doc_id"))
    val nNull = withNulls.filter($"doc_id".isNull).count()
    assert(nNull > 0)

    val fastAnti = BloomJoin.antiJoin(withNulls, deny, "doc_id", "doc_id", 1000L)
      .select($"doc_id").as[Option[Long]].collect().sorted.toSeq
    val exactAnti = withNulls.join(deny, Seq("doc_id"), "left_anti")
      .select($"doc_id").as[Option[Long]].collect().sorted.toSeq
    assert(fastAnti == exactAnti)
    assert(fastAnti.count(_.isEmpty) == nNull, "anti join must RETAIN null keys")

    val fastSemi = BloomJoin.semiJoin(withNulls, deny, "doc_id", "doc_id", 1000L)
      .select($"doc_id").as[Option[Long]].collect().sorted.toSeq
    val exactSemi = withNulls.join(deny, Seq("doc_id"), "left_semi")
      .select($"doc_id").as[Option[Long]].collect().sorted.toSeq
    assert(fastSemi == exactSemi)
    assert(!fastSemi.exists(_.isEmpty), "semi join must DROP null keys")
  }

  test("non-integral key columns are rejected at the entry point") {
    val strDocs = docs.withColumn("doc_id", $"doc_id".cast("string"))
    val strDeny = deny.withColumn("doc_id", $"doc_id".cast("string"))
    val e1 = intercept[IllegalArgumentException] {
      BloomJoin.antiJoin(strDocs, deny.withColumn("doc_id", $"doc_id".cast("string")),
        "doc_id", "doc_id", 1000L)
    }
    assert(e1.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(docs, strDeny, "doc_id", "doc_id", 1000L)
    }
    assert(e2.getMessage.contains("integral"))
  }

  test("no false negatives: the probe admits every true member") {
    val bf = deny.stat.bloomFilter("doc_id", 1000L, 0.01)
    val members = deny.as[Long].collect()
    assert(members.nonEmpty)
    members.foreach(id => assert(bf.mightContainLong(id), s"false negative: $id"))
  }

  test("the probe sits in the scan-side plan as a codegen'd filter") {
    val plan = BloomJoin.semiJoin(docs, deny, "doc_id", "doc_id", 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"), plan)
  }

  test("pre-filter passes only a sliver of non-members at fpp=0.01") {
    val bytes = {
      val bf = deny.stat.bloomFilter("doc_id", 1000L, 0.01)
      val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray
    }
    val nonMembers = docs.filter($"doc_id" % 13 =!= 0)
    val passed = nonMembers
      .filter(call_function("graft_bloom_contains", lit(bytes), $"doc_id"))
      .count()
    val total = nonMembers.count()
    // fpp 0.01 with slack ×5 — the point is orders of magnitude, not
    // the exact constant
    assert(passed <= math.max(5L, total / 20),
      s"$passed of $total non-members passed the pre-filter")
  }
}
