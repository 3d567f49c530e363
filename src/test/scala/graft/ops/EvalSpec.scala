package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class EvalSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("rocAuc: perfect, inverted, tied, and single-class groups") {
    val df = Seq(
      // g=perfect: positives strictly above negatives -> AUC 1
      ("perfect", 1L, 0L), ("perfect", 2L, 0L),
      ("perfect", 3L, 1L), ("perfect", 4L, 1L),
      // g=inverted: positives strictly below -> AUC 0
      ("inverted", 1L, 1L), ("inverted", 2L, 0L),
      // g=tied: scores [1,1,2] labels [0,1,1]: avg ranks 1.5/1.5/3,
      // R+ = 4.5, AUC = (4.5 - 3) / (2*1) = 0.75
      ("tied", 1L, 0L), ("tied", 1L, 1L), ("tied", 2L, 1L),
      // g=onlypos: undefined -> NULL
      ("onlypos", 5L, 1L), ("onlypos", 6L, 1L)
    ).toDF("g", "s", "y")
    val byG = Eval.rocAuc(df, $"s", $"y", Seq("g" -> $"g"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(byG("perfect") == ((2L, 2L, Some(1000000L))))
    assert(byG("inverted") == ((1L, 1L, Some(0L))))
    assert(byG("tied") == ((2L, 1L, Some(750000L))))
    assert(byG("onlypos") == ((2L, 0L, None)))
  }

  test("rocAuc equals direct pairwise counting on random data") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { _ =>
      ("g", rnd.nextInt(40).toLong, if (rnd.nextBoolean()) 1L else 0L)
    }
    val got = Eval.rocAuc(rows.toDF("g", "s", "y"), $"s", $"y",
      Seq("g" -> $"g")).collect().head
    val pos = rows.filter(_._3 == 1L).map(_._2)
    val neg = rows.filter(_._3 == 0L).map(_._2)
    val wins = pos.map(p => neg.count(_ < p).toLong).sum
    val ties = pos.map(p => neg.count(_ == p).toLong).sum
    val expected = (wins * 2 + ties) * 1000000L /
      (2L * pos.size * neg.size)
    assert(got.getLong(3) == expected)
  }

  test("calibrationBins: sizes, exact means, ppm rates") {
    // 4 rows, 2 bins: sorted by (s, id) -> bins {1,2},{3,4}
    val df = Seq((1L, 10L, 0L), (2L, 20L, 1L), (3L, 30L, 1L), (4L, 40L, 1L))
      .toDF("id", "s", "y")
    val got = Eval.calibrationBins(df, $"s", $"y", $"id", bins = 2)
      .orderBy("bin").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 15L, 500000L),  // mean(10,20)=15, 1/2 positive
      (2L, 2L, 35L, 1000000L)))
  }

  test("chiSqFeatures: counts, every-doc token skipped, ranking") {
    val docs = Seq(
      ("en", "the cat sat"), ("en", "the dog ran"),
      ("de", "the katze hund"), ("de", "the hund ran")
    ).toDF("lang", "text")
    val got = Eval.chiSqFeatures(docs, $"text", $"lang", k = 2)
      .orderBy($"label", $"chi2".desc, $"token").collect()
    // "the" appears in every doc -> skipped
    assert(!got.exists(_.getString(1) == "the"))
    // "hund": a(de)=2, b=0, c=0, d=2 -> chi2 = 4*(2*2-0)^2/(2*2*2*2) = 4
    val hund = got.filter(r => r.getString(0) == "de" && r.getString(1) == "hund")
    assert(hund.length == 1)
    assert(hund.head.getLong(2) == 2L && hund.head.getLong(3) == 0L)
    assert(hund.head.getDouble(4) == 4.0)
    // top-2 per label, fully-discriminating tokens first
    assert(got.count(_.getString(0) == "de") == 2)
    assert(got.count(_.getString(0) == "en") == 2)
    val deTokens = got.filter(_.getString(0) == "de").map(_.getString(1)).toSeq
    assert(deTokens == Seq("hund", "katze")) // both chi2-max, token tiebreak
  }

  test("recEval: hits, MRR, NDCG hand case; unmeasurable part NULL") {
    val recs = Seq(
      (1L, 10L, 5L), (1L, 20L, 3L), (1L, 30L, 3L), // part 1: ranks 10,20,30
      (2L, 10L, 1L))                               // part 2: one rec
      .toDF("part", "rec", "cooc")
    val rel = Seq((1L, 20L), (1L, 99L), (20L, 1L), (99L, 1L))
      .toDF("part", "rec")
    val got = Eval.recEval(recs, rel, k = 5).orderBy("part")
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSeq
    // part 1: hit at rank 2 only; nrel = 2 -> idcg = 1000000 + 630930
    val ndcg1 = 630930L * 1000000L / 1630930L
    assert(got == Seq(
      (1L, 3L, 1L, 500000L, Some(ndcg1)),
      (2L, 1L, 0L, 0L, None))) // no held-out partner: NULL, not 0
  }

  test("recEval: perfect ranking scores ndcg 1000000") {
    val recs = Seq((1L, 10L, 9L), (1L, 20L, 8L)).toDF("part", "rec", "cooc")
    val rel = Seq((1L, 10L), (1L, 20L)).toDF("part", "rec")
    val got = Eval.recEval(recs, rel, k = 5).collect().head
    assert(got.getLong(2) == 2L)          // hits
    assert(got.getLong(3) == 1000000L)    // rr
    assert(got.getLong(4) == 1000000L)    // ndcg
  }

  test("classifierAudit: per-class metrics and Cohen's kappa") {
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"))
      .toDF("t", "p")
    val got = Eval.classifierAudit(df, $"t", $"p").orderBy("label")
      .collect()
    val rows = got.map(r => r.getString(0) -> r).toMap
    // a: nt=2 np=1 tp=1; b: nt=2 np=3 tp=2
    assert(rows("a").getLong(4) == 1000000L) // precision
    assert(rows("a").getLong(5) == 500000L)  // recall
    assert(rows("a").getLong(6) == 666666L)  // f1 = 2/3
    assert(rows("b").getLong(4) == 666666L)
    assert(rows("b").getLong(5) == 1000000L)
    assert(rows("b").getLong(6) == 800000L)
    assert(rows("a").isNullAt(7) && rows("b").isNullAt(7))
    // __all: n=4 agree=3, pe = 2*1 + 2*3 = 8, kappa = (12-8)/(16-8) = .5
    val all = rows("__all")
    assert(all.getLong(1) == 4L && all.getLong(3) == 3L)
    assert(all.getLong(4) == 750000L)
    assert(all.getLong(7) == 500000L)
  }

  test("classifierAudit: never-predicted class has NULL precision") {
    val df = Seq(("a", "b"), ("b", "b")).toDF("t", "p")
    val got = Eval.classifierAudit(df, $"t", $"p").orderBy("label").collect()
    val a = got.find(_.getString(0) == "a").get
    assert(a.isNullAt(4))              // precision undefined
    assert(a.getLong(5) == 0L)         // recall 0
  }

  test("targetEncodeLoo: leave-one-out means, singleton NULL") {
    val df = Seq((1L, "a", 2L), (2L, "a", 4L), (3L, "a", 9L), (4L, "b", 7L))
      .toDF("id", "k", "y")
    val got = Eval.targetEncodeLoo(df, $"id", $"k", $"y")
      .orderBy("id").as[(Long, String, Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, "a", Some(6L)),  // (4+9)/2 = 6.5 -> floor 6
      (2L, "a", Some(5L)),  // (2+9)/2 = 5.5 -> floor 5
      (3L, "a", Some(3L)),  // (2+4)/2 = 3
      (4L, "b", None)))
  }
}
