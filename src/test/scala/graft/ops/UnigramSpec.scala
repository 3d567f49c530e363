package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Unigram-LM tokenizer learning (q201): the compiled Viterbi kernel
  * against a brute-force enumeration twin (the oracle's shape), the
  * codepoint contract, and the EM loop's hand-computed rounds incl.
  * the prune-driven movement the rounds exist for. */
class UnigramSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  graft.functions.CatalystExpressions.register(spark)

  private def kernel(words: Seq[String], vocab: Seq[(String, Long)],
      maxLen: Int): Seq[Option[Seq[String]]] = {
    val rows = words.map(Tuple1(_)).toDF("w")
      .select(call_function("graft_unigram_viterbi", col("w"),
        typedLit(vocab.map(_._1)), typedLit(vocab.map(_._2)),
        lit(maxLen)).as("pcs"))
      .collect()
    rows.toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getSeq[String](0)))
  }

  /** Brute-force twin: enumerate ALL decompositions into vocab pieces
    * (codepoint-indexed), pick argmax by the ORACLE's path-level key —
    * score DESC, n ASC, reversed start-position list ASC. The kernel's
    * DP tie-break (fewer pieces, then smallest predecessor per cell)
    * must equal this on every input. */
  private def brute(w: String, vocab: Map[String, Long],
      maxLen: Int): Option[Seq[String]] = {
    val cps = w.codePoints().toArray
    val n = cps.length
    def sub(i: Int, j: Int) = new String(cps, i, j - i)
    def paths(i: Int): Seq[(Long, List[String], List[Int])] =
      if (i == n) Seq((0L, Nil, Nil))
      else (1 to math.min(maxLen, n - i)).flatMap { l =>
        val p = sub(i, i + l)
        vocab.get(p) match {
          case Some(q) =>
            paths(i + l).map { case (s, ps, brs) => (s + q, p :: ps, (i + 1) :: brs) }
          case None => Seq.empty
        }
      }
    val all = paths(0)
    if (all.isEmpty) None
    else Some(all.minBy { case (s, ps, brs) =>
      // score DESC, n ASC, list_reverse(brk) ASC — encode as an
      // ordered tuple (Ordering on Iterable is lexicographic)
      (-s, ps.length, brs.reverse: Iterable[Int])
    }._2)
  }

  test("Viterbi kernel equals brute-force enumeration under the oracle key") {
    val rnd = new scala.util.Random(4242)
    val alpha = "ab"
    var cases = 0
    for (_ <- 1 to 120) {
      val w = Seq.fill(1 + rnd.nextInt(8))(alpha(rnd.nextInt(2))).mkString
      // all substrings up to len 3, sampled; chars always in
      val subs = (for {
        i <- 0 until w.length; l <- 1 to math.min(3, w.length - i)
      } yield w.substring(i, i + l)).distinct
      val vocab = subs.filter(p => p.length == 1 || rnd.nextBoolean())
        // tiny score range -> frequent exact ties, exercising both
        // tie-break stages
        .map(p => p -> -(1L + rnd.nextInt(3)) * 1000L).toMap
      val got = kernel(Seq(w), vocab.toSeq, maxLen = 3).head
      val want = brute(w, vocab, maxLen = 3)
      assert(got == want, s"word=$w vocab=$vocab")
      cases += 1
    }
    assert(cases == 120)
  }

  test("Viterbi kernel indexes by CODEPOINT, not UTF-16 code unit") {
    // U+1D552/U+1D553 (mathematical a/b) are supplementary-plane:
    // String.length 2 each. A code-unit DP would mis-slice every piece.
    val a = new String(Character.toChars(0x1D552))
    val b = new String(Character.toChars(0x1D553))
    val w = a + b + a
    val vocab = Seq(a -> -900L, b -> -900L, (a + b) -> -1000L)
    // [ab, a] = -1900 beats [a, b, a] = -2700
    assert(kernel(Seq(w), vocab, maxLen = 2).head ==
      Some(Seq(a + b, a)))
    // and the same shape in ASCII picks the same structure
    assert(kernel(Seq("aba"),
      Seq("a" -> -900L, "b" -> -900L, "ab" -> -1000L), 2).head ==
      Some(Seq("ab", "a")))
  }

  test("Viterbi kernel: ties prefer fewer pieces, then smallest predecessor") {
    // equal scores everywhere: [aa] (1 piece) beats [a,a]
    assert(kernel(Seq("aa"), Seq("a" -> -1000L, "aa" -> -1000L), 2).head ==
      Some(Seq("aa")))
    // "aaa" with q(a)=-500, q(aa)=-1000: [a,aa]/[aa,a]/[a,a,a] all -1500.
    // n: 2 < 3; among the two 2-piece paths the last DP cell prefers the
    // SMALLER predecessor -> longer last piece -> [a, aa]
    assert(kernel(Seq("aaa"), Seq("a" -> -500L, "aa" -> -1000L), 2).head ==
      Some(Seq("a", "aa")))
    // uncovered char -> null (callers keep the charset in vocab)
    assert(kernel(Seq("ax"), Seq("a" -> -1L), 2).head.isEmpty)
  }

  test("unigramLearn: hand-computed single round on a tiny corpus") {
    // words: ab x2, b x1. seed: chars a:2 b:3, multi ab:2; tot=7.
    // Viterbi("ab"): [ab] (one piece) beats [a,b] (two, lower sum).
    // usage: ab:2, b:1; a unused -> floor 1. Final tot=4.
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLearn(docs, rounds = 1, maxPieceLen = 2,
      seedSize = 10, keepMulti = 10)
      .as[(Long, String, Long, Long)].collect().toSeq
    def q(c: Long, t: Long) = math.floor(1e6 * math.log(c.toDouble / t)).toLong
    assert(got == Seq(
      (1L, "ab", 2L, q(2, 4)),
      (2L, "a", 1L, q(1, 4)),
      (3L, "b", 1L, q(1, 4))))
  }

  test("unigramLearn: the prune MOVES the fixed point across rounds") {
    // "abcd" x2, "ab" x3, "cd" x3 with keepMulti=1: round 1 segments
    // abcd=[ab,cd] and keeps only "ab" (cnt tie 5=5, piece asc), so
    // round 2 re-segments abcd=[ab,c,d] and cd=[c,d] — usage mass
    // moves to the chars; rounds=1 and rounds=2 disagree.
    val docs = Seq((1L, "abcd abcd ab ab ab cd cd cd")).toDF("doc_id", "text")
    def run(r: Int) = TextAnalysis.unigramLearn(docs, rounds = r,
      maxPieceLen = 2, seedSize = 10, keepMulti = 1)
      .as[(Long, String, Long, Long)].collect().toSeq
    val r1 = run(1)
    val r2 = run(2)
    // round 1: abcd=[ab,cd], usage ab:5 cd:5, tie -> "ab" kept (piece asc)
    assert(r1.map(x => (x._2, x._3)).toSet ==
      Set(("ab", 5L), ("a", 1L), ("b", 1L), ("c", 1L), ("d", 1L)))
    // round 2 re-segments abcd=[ab,c,d], cd=[c,d]: mass moves to c/d
    assert(r2.map(x => (x._2, x._3)).toSet ==
      Set(("ab", 5L), ("c", 5L), ("d", 5L), ("a", 1L), ("b", 1L)))
    // and the rank order is deterministic: cnt desc, piece UTF-8 asc
    assert(r2.map(_._2) == Seq("ab", "c", "d", "a", "b"))
  }

  test("unigramLearn: driver-side and distributed loop engines agree") {
    val docs = Seq((1L, "abcd abcd ab ab ab cd cd cd ee ee b"),
      (2L, "abab baba ab ee abcd")).toDF("doc_id", "text")
    val local = TextAnalysis.unigramLearn(docs, rounds = 3,
      maxPieceLen = 3, seedSize = 8, keepMulti = 3)
      .as[(Long, String, Long, Long)].collect().toSeq
    val dist = TextAnalysis.unigramLearn(docs, rounds = 3,
      maxPieceLen = 3, seedSize = 8, keepMulti = 3,
      driverLoopMaxVocab = 0L)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(local == dist)
    assert(local.nonEmpty)
  }

  test("unigramLearn: engines agree on randomized corpora (property)") {
    val rnd = new scala.util.Random(1515)
    for (trial <- 1 to 4) {
      val alpha = "abc"
      val nDocs = 2 + rnd.nextInt(3)
      val docs = (1 to nDocs).map { i =>
        val words = Seq.fill(3 + rnd.nextInt(8))(
          Seq.fill(1 + rnd.nextInt(6))(alpha(rnd.nextInt(3))).mkString)
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val local = TextAnalysis.unigramLearn(docs, rounds = 2,
        maxPieceLen = 3, seedSize = 12, keepMulti = 4)
        .as[(Long, String, Long, Long)].collect().toSeq
      val dist = TextAnalysis.unigramLearn(docs, rounds = 2,
        maxPieceLen = 3, seedSize = 12, keepMulti = 4,
        driverLoopMaxVocab = 0L)
        .as[(Long, String, Long, Long)].collect().toSeq
      assert(local == dist, s"trial $trial: engines diverged")
    }
  }

  test("unigramLearn: engines agree on non-BMP corpora (codepoint seed)") {
    val a = new String(Character.toChars(0x1D552)) // supplementary plane
    val b = new String(Character.toChars(0x1D553))
    val docs = Seq((1L, s"$a$b$a$b $a$b ${b}${b} $a")).toDF("doc_id", "text")
    val local = TextAnalysis.unigramLearn(docs, rounds = 2,
      maxPieceLen = 2, seedSize = 6, keepMulti = 2)
      .as[(Long, String, Long, Long)].collect().toSeq
    val dist = TextAnalysis.unigramLearn(docs, rounds = 2,
      maxPieceLen = 2, seedSize = 6, keepMulti = 2,
      driverLoopMaxVocab = 0L)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(local == dist)
    // pieces are whole codepoints, never split surrogates
    assert(local.forall { case (_, p, _, _) =>
      p.codePointCount(0, p.length) <= 2 &&
        !(p.length == 1 && Character.isSurrogate(p.charAt(0))) })
  }

  test("unigramTokenStats: absolute positions across words, hand checksum") {
    // vocab ids/scores fixed by hand: ab->1(-1000), a->2(-2000), b->3(-2000)
    val vocab = Seq(("ab", 1L, -1000L), ("a", 2L, -2000L), ("b", 3L, -2000L))
    val docs = Seq(
      (1L, "ab a b ab"), // tokens ab,a,b,ab @1..4: wsum 1+4+9+4 = 18
      (2L, "aab b"),     // aab=[a,ab] (beats [a,a,b]): a@1,ab@2,b@3 -> 2+2+9
      (3L, "ab xx b"))   // "xx" unsegmentable -> contributes nothing
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramTokenStats(docs, vocab, maxPieceLen = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 4L, 18L),
      (2L, 2L, 3L, 13L),
      (3L, 2L, 2L, 7L))) // ab@1 (1) + b@2 (6); xx skipped in count AND pos
  }

  test("unigramPerplexity: integer nll/ppl, worst-k order, hand-computed") {
    val vocab = Seq(("ab", 1L, -1000L), ("a", 2L, -2000L), ("b", 3L, -2000L))
    val docs = Seq(
      (1L, "ab ab"), // nll 2000, n 2, ppl 1000
      (2L, "a b"),   // nll 4000, n 2, ppl 2000
      (3L, "aab"))   // [a,ab]: nll 3000, n 2, ppl 1500
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramPerplexity(docs, vocab,
      maxPieceLen = 2, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (2L, 2L, 4000L, 2000L),
      (3L, 2L, 3000L, 1500L)))
  }

  test("apply entry points refuse vocab pieces longer than maxPieceLen (ADVICE r15)") {
    // the kernel only probes pieces up to maxPieceLen codepoints, so a
    // longer piece would be silently unusable by the engine while the
    // oracle's unbounded substr join would use it — must fail loudly.
    // 'ab' is 2 codepoints; the non-BMP piece is 2 codepoints in 4 chars.
    val vocab = Seq(("ab", 1L, -1000L), ("a", 2L, -2000L), ("b", 3L, -2000L))
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.unigramTokenStats(docs, vocab, maxPieceLen = 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.unigramPerplexity(docs, vocab, maxPieceLen = 1)
    }
    // codepoint length, not UTF-16 length: a 2-codepoint supplementary
    // piece fits maxPieceLen=2 even though it is 4 UTF-16 chars
    val nonBmp = new String(Character.toChars(0x1F600)) * 2
    val vb = Seq((nonBmp, 1L, -1000L), (nonBmp.substring(0, 2), 2L, -2000L))
    TextAnalysis.unigramTokenStats(Seq((1L, nonBmp)).toDF("doc_id", "text"),
      vb, maxPieceLen = 2).collect()
  }

  test("unigramLearn: charset always survives with a count floor of 1") {
    val docs = Seq((1L, "zzzz zzzz")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLearn(docs, rounds = 2, maxPieceLen = 4,
      seedSize = 10, keepMulti = 10)
      .as[(Long, String, Long, Long)].collect().toSeq
    // "zzzz" segments as the whole-word piece every round: zz/zzz are
    // pruned at round 1 (usage 0), z survives the prune with floor 1
    assert(got.map(x => (x._2, x._3)).toSet ==
      Set(("zzzz", 2L), ("z", 1L)))
  }
}
