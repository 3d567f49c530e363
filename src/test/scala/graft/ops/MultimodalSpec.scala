package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class MultimodalSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a" * 300), // 300 bytes -> frames at 0,128,256? 256+64>300 -> 0,128
    (2L, "b" * 64), // exactly one frame
    (3L, "c" * 63) // too short: no frames
  ).toDF("doc_id", "text")

  test("frameSample slices [i*stride, i*stride+frameSize) per row") {
    val frames = Multimodal.frameSample(Multimodal.withPayload(docs), 64, 128)
      .select($"doc_id", $"frame_no", length($"frame").as("len"))
      .as[(Long, Long, Int)].collect().toSet
    // doc 1: (300-64) div 128 + 1 = 2 frames; doc 2: 1; doc 3: 0
    assert(frames == Set((1L, 0L, 64), (1L, 1L, 64), (2L, 0L, 64)))
  }

  test("frameSample is declarative: no shuffle below the expansion") {
    val plan = Multimodal.frameSample(Multimodal.withPayload(docs), 64, 128)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("resize keeps every stride-th byte and shrinks length") {
    val out = Multimodal.resize(spark,
      Multimodal.withPayload(docs), stride = 4)
      .select($"doc_id", length($"payload").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out(1L) == 75 && out(2L) == 16 && out(3L) == 16)
    assert(Multimodal.resizeStub("abcdefgh".getBytes, 3).toSeq ==
      "adg".getBytes.toSeq)
  }

  test("decode features match the payload bytes") {
    val f = Multimodal.extractFeatures(spark, docs.filter($"doc_id" === 2L))
      .as[Multimodal.MediaFeatures].head()
    assert(f.n_bytes == 64 && f.first_byte == 'b'.toInt)
  }

  test("declarative features equal the mapPartitions stub, incl. empty payload") {
    val withEmpty = docs.union(Seq((4L, "")).toDF("doc_id", "text"))
    val imperative = Multimodal.extractFeatures(spark, withEmpty)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val declarative = Multimodal.extractFeaturesDeclarative(withEmpty)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(declarative == imperative)
  }

  test("declarative features stay in codegen: no object boundary, no shuffle below sort") {
    val plan = Multimodal.extractFeaturesDeclarative(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan)
    assert(!plan.contains("MapPartitions"), plan)
  }
}
