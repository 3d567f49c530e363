package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.functions.TextFunctions

class TextAnalysisSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("phraseHits: word-aligned first positions, strpos contract, seeded replay") {
    val phrases = Seq("a b", "a b c", "b c", "zz", "c")
    val docs = Seq(
      (1L, "x a b c"),    // hits "a b"@3, "a b c"@3, "b c"@5, "c"@7
      (2L, "a b x b c"),  // padding edge: phrase at start
      (3L, "ab c"),       // "c"@4 only — "b c" must NOT match inside "ab c"
      (4L, "w w w"),      // no hits at all
      (5L, "c c c"))      // overlap/repeat: "c"@2 (first only)
      .toDF("doc_id", "text")
    val got = TextAnalysis.phraseHits(docs, phrases)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // strpos positions are into ' '||text||' ' (1-based)
    assert(got == Seq(
      (1L, 1L, "a b", 3L), (1L, 2L, "a b c", 3L), (1L, 3L, "b c", 5L),
      (1L, 5L, "c", 7L),
      (2L, 1L, "a b", 1L), (2L, 3L, "b c", 7L), (2L, 5L, "c", 9L),
      (3L, 5L, "c", 4L),
      (5L, 5L, "c", 1L)))
    // seeded random replay against String.indexOf on padded strings
    val rnd = new scala.util.Random(0xAC0DEL)
    val vocab = Array("a", "b", "c", "d")
    val texts = (1 to 60).map(i =>
      (i.toLong, Seq.fill(20)(vocab(rnd.nextInt(4))).mkString(" ")))
    val probes = Seq("a b", "c d a", "d d", "b")
    val want = texts.flatMap { case (id, t) =>
      probes.zipWithIndex.flatMap { case (p, pi) =>
        val at = (" " + t + " ").indexOf(" " + p + " ")
        if (at < 0) None else Some((id, (pi + 1).toLong, p, (at + 1).toLong))
      }
    }.sortBy(r => (r._1, r._2))
    val got2 = TextAnalysis.phraseHits(texts.toDF("doc_id", "text"), probes)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got2 == want)
  }

  test("boilerplateNgrams: doc-frequency semantics, ties broken by gram asc") {
    val docs = Seq(
      (1L, "a b c d e x"),     // grams: "a b c d e", "b c d e x"
      (2L, "a b c d e y"),     // shares "a b c d e"
      (3L, "a b c d e a b c d e"), // in-doc repeat counts ONCE
      (4L, "q r s t u"))       // unshared
      .toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateNgrams(docs, n = 5, minDocs = 2, k = 5)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a b c d e", 3L)))
  }

  test("polyHash matches the documented fold ((acc*31 + code) mod 1e9+7)") {
    val fp = Seq("ab").toDF("text")
      .select(TextFunctions.polyHash(col("text")).as("fp")).as[Long].head()
    assert(fp == (97L * 31 + 98) % 1000000007L) // 'a'=97 then 'b'=98
    val empty = Seq("").toDF("text")
      .select(TextFunctions.polyHash(col("text")).as("fp")).as[Long].head()
    assert(empty == 0L)
  }

  test("polyHash: compiled fold == driver-side twin on non-ASCII (index bucket agreement)") {
    // the r12 divergence: the old ascii()-based Column fold hashed the
    // first UTF-8 byte per char while polyHashLocal folded UTF-16 units,
    // so a non-ASCII term's postings were written to one bucket and
    // serve-time pruned to another; the compiled kernel shares the fold
    val terms = Seq("héllo", "日本語テキスト", "café au lait", "naïve café",
      "plain ascii", "", "Ωμέγα")
    val sparkSide = terms.toDF("t")
      .select(TextFunctions.polyHash(col("t")).as("h")).as[Long].collect().toSeq
    val local = terms.map(TextAnalysis.polyHashLocal)
    assert(sparkSide == local)
    val buckets = terms.map(t => TextAnalysis.polyHashLocal(t) % 16)
    assert(buckets.forall(b => b >= 0 && b < 16)) // fold never negative
  }

  test("bpeMergeStats: freq-weighted pair counts, deterministic order, bounded") {
    // vocab: ab freq 3, cd freq 1, x freq 1 (len<2 -> no pairs)
    val docs = Seq((1L, "ab ab cd"), (2L, "ab x")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMergeStats(docs, m = 10).orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "ab", "a", "b", 3L), (2L, "cd", "c", "d", 1L)))
    // m caps the merge list; ties cut deterministically by pair asc
    val capped = TextAnalysis.bpeMergeStats(docs, m = 1).orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(capped == Seq((1L, "ab", "a", "b", 3L)))
    // overlapping pairs: "aaa" (freq 1) yields aa at two positions -> cnt 2
    val tri = Seq((1L, "aaa")).toDF("doc_id", "text")
    val g2 = TextAnalysis.bpeMergeStats(tri, m = 5).orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(g2 == Seq((1L, "aa", "a", "a", 2L)))
  }

  test("bpeLearnMerges: the loop RECOUNTS — learned list diverges from seed ranking") {
    // seed pair counts: (a,b)=4, (b,c)=3, (b,d)=1 — static top-2 = [ab, bc].
    // Round 1 merges (a,b); round 2's recount sees (ab,c)=3, (ab,d)=1 —
    // "bc" no longer exists as a pair, the multi-char (ab,c) wins.
    val docs = Seq((1L, "abc abc abc abd")).toDF("doc_id", "text")
    val learned = TextAnalysis.bpeLearnMerges(docs, k = 2).orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(learned == Seq((1L, "ab", "a", "b", 4L), (2L, "abc", "ab", "c", 3L)))
    val static = TextAnalysis.bpeMergeStats(docs, m = 2).orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(static.map(_._2) == Seq("ab", "bc")) // provably different lists
  }

  test("bpeLearnMerges: greedy left-to-right merge application in runs") {
    // merge (a,a) in "aaaa" takes positions 1-2 and 3-4 (never 2-3), in
    // "aaa" takes 1-2 and leaves the tail 'a'. Counts: round 1 sees
    // (a,a) at 3+2+1 = 6 weighted positions; after merging, "aaaa" is
    // [aa,aa], "aaa" is [aa,a], "aa" is [aa] -> round 2 counts
    // (aa,aa)=1, (aa,a)=1 and picks (aa,a) by pair-asc tie-break.
    val docs = Seq((1L, "aaaa aaa aa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeLearnMerges(docs, k = 2).orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "aa", "a", "a", 6L), (2L, "aaa", "aa", "a", 1L)))
  }

  test("bpeLearnMerges: exhaustion stops early; empty corpus learns nothing") {
    // single-char words have no pairs after the only possible merge
    val docs = Seq((1L, "ab ab a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeLearnMerges(docs, k = 10).orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "ab", "a", "b", 2L))) // k=10 asked, 1 possible
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.bpeLearnMerges(empty, k = 3).isEmpty)
  }

  test("bpeLearnMerges: driver-side and distributed loop engines agree") {
    val docs = Seq((1L, "abc abc abc abd"), (2L, "aaaa aaa aa"),
      (3L, "merge merge merge sort sort"), (4L, "x")).toDF("doc_id", "text")
    val local = TextAnalysis.bpeLearnMerges(docs, k = 6).orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    val dist = TextAnalysis
      .bpeLearnMerges(docs, k = 6, driverLoopMaxVocab = 0L).orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(local == dist && local.size == 6)
  }

  test("bpeLearnMerges: engines agree on non-BMP count ties (UTF-8 order)") {
    // (U+FFFD, z) and (U+1F600, z) tie at count 1. Binary UTF-8 order —
    // what Spark's ORDER BY and DuckDB's min both apply — puts U+FFFD
    // (EF BF BD) below U+1F600 (F0 9F 98 80); JVM String '<' disagrees
    // (the high surrogate 0xD83D sorts below the 0xFFFD code unit), so
    // a code-unit tie-break in the local loop would flip the winner.
    val rep = "�"         // U+FFFD replacement char (BMP, high)
    val emo = "😀"   // U+1F600 (supplementary plane)
    val docs = Seq((1L, s"${rep}z ${emo}z")).toDF("doc_id", "text")
    val local = TextAnalysis.bpeLearnMerges(docs, k = 1).orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    val dist = TextAnalysis
      .bpeLearnMerges(docs, k = 1, driverLoopMaxVocab = 0L).orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(local == dist)
    assert(local == Seq((1L, rep + "z", rep, "z", 1L)))
  }

  test("bpeLearnVocab: charset-then-merges ids, first occurrence on collision") {
    val docs = Seq((1L, "abc abc abc abd")).toDF("doc_id", "text")
    val vocab = TextAnalysis.bpeLearnVocab(docs, k = 2)
    // charset sorted asc (space included — tokenize runs on raw text),
    // then learned merges in rank order
    assert(vocab == Seq(" ", "a", "b", "c", "d", "ab", "abc"))
    // apply half: greedy longest-match over the learned vocab
    val stats = TextAnalysis.subwordTokenStats(docs, vocab)
      .as[(Long, Long, Long, Long)].head()
    // "abc abc abc abd" -> abc,' ',abc,' ',abc,' ',ab,d = 8 tokens, 0 unk
    assert(stats._2 == 8L && stats._3 == 0L)
  }

  test("multimodal decode stub checksum equals polyHash on ASCII payloads") {
    val docs = Seq((1L, "hello world graft")).toDF("doc_id", "text")
    val viaBytes = Multimodal.extractFeatures(spark, docs)
      .select("checksum").as[Long].head()
    val viaChars = docs.select(TextFunctions.polyHash(col("text")).as("fp"))
      .as[Long].head()
    assert(viaBytes == viaChars)
  }

  test("quality score stays in [0,1] and rewards diverse long docs") {
    val docs = Seq(
      (1L, "dup dup dup dup dup dup dup dup"),
      (2L, "a genuinely varied collection of distinct meaningful tokens here"))
      .toDF("doc_id", "text")
    val scores = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(2L) > scores(1L))
  }

  test("langId is deterministic with lexicographic tie-break") {
    // no markers at all -> every score 0 -> tie -> first lang asc ("de")
    val pred = TextAnalysis.langId(Seq((1L, "zz yy xx")).toDF("doc_id", "text"))
      .select("pred_lang").as[String].head()
    assert(pred == "de")
    // clear zh markers win
    val zh = TextAnalysis.langId(
      Seq((1L, "join group stream join group")).toDF("doc_id", "text"))
      .select("pred_lang").as[String].head()
    assert(zh == "zh")
  }

  test("token counts: whitespace vs regex tokenizer") {
    val out = TextAnalysis.tokenCounts(Seq((1L, "ab 12 cd")).toDF("doc_id", "text"))
      .select("ws_toks", "re_toks").as[(Long, Long)].head()
    assert(out == ((3L, 3L)))
    val mixed = TextAnalysis.tokenCounts(Seq((1L, "ab12cd")).toDF("doc_id", "text"))
      .select("ws_toks", "re_toks").as[(Long, Long)].head()
    assert(mixed == ((1L, 3L))) // "ab", "12", "cd" under the regex
  }

  test("repetition signals: hand-computed fractions, degenerate docs score high") {
    // "a b a b a": words=5, 2-grams total=4, distinct={"a b","b a"}=2
    //   -> rep_gram_frac = (4-2)/4 = 0.5; top word "a" 3/5 = 0.6
    // "v w x y z": all distinct -> rep 0.0, top 1/5 = 0.2
    // "a": total 2-grams = 0 -> rep 0.0 (guarded), top 1/1 = 1.0
    val docs = Seq((1L, "a b a b a"), (2L, "v w x y z"), (3L, "a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id")
      .as[(Long, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 0.5, 0.6), (2L, 0.0, 0.2), (3L, 0.0, 1.0)))
  }

  test("wordShingles compiled expression: distinct, ordered, short-doc empty") {
    val sh = Seq("a b a b c").toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 2).as("sh"))
      .as[Seq[String]].head()
    assert(sh == Seq("a b", "b a", "b c")) // "a b" deduped, first-occurrence order
    val short = Seq("one two").toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 3).as("sh"))
      .as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("bigramLmScore: corpus-trained transition probabilities, exact means") {
    // corpus: "a b" ×2 and "a c" ×1 -> P(b|a)=2/3, P(c|a)=1/3
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"),
      (4L, "a"),   // no bigrams -> n=0, score 0
      (5L, "a b a c")) // bigrams: a b (2/3), b a (1/1), a c (1/3)
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // doc5 prefix counts include its own grams: corpus has a->{b,b,c,b,c}
    // and b->{a}: P(b|a)=3/5, P(a|b)=1/3... recompute: bigrams overall:
    // "a b":3, "a c":2, "b a":1; prefix a:5, b:1 (docs 1,2: a b; 3: a c;
    // 5: a b, b a, a c). P(b|a)=3/5=0.6, P(c|a)=2/5=0.4, P(a|b)=1/1=1.0
    val d1 = 0.6
    val d3 = 0.4
    val d5 = BigDecimal.valueOf((0.6 + 1.0 + 0.4) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 1L, d1), (2L, 1L, d1), (3L, 1L, d3),
      (4L, 0L, 0.0), (5L, 3L, d5)))
  }

  test("bm25TopK matches a hand-computed score; docs without query terms drop") {
    val docs = Seq(
      (1L, "join join scan x"),   // dl 4: join tf=2, scan tf=1
      (2L, "scan y z"),           // dl 3: scan tf=1
      (3L, "nothing relevant")    // dl 2: no query terms
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, Seq("join", "scan"), k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    // N=3, sdl=9, avgdl=3.0; df(join)=1, df(scan)=2
    val avgdl = 9.0 / 3
    def part(tf: Long, dl: Long, df: Long): Double =
      ((3L - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = r6(part(2L, 4L, 1L) + part(1L, 4L, 2L)) // fold in term order
    val d2 = r6(part(1L, 3L, 2L))
    assert(got.map(_._1) == Seq(1L, 2L), got.toString) // doc 3 absent
    assert(got == Seq((1L, 2L, d1), (2L, 1L, d2)), got.toString)
  }

  test("bm25MoreLikeThis: exact twin ranks first, self excluded, short docs inert") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),   // query
      (1L, "alpha beta gamma delta epsilon"),   // exact twin -> rank 1
      (2L, "alpha beta gamma zeta eta"),        // shares 1 shingle
      (3L, "totally different words here now"), // shares none
      (4L, "xy")                                // < 3 words: no shingles
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25MoreLikeThis(docs, col("doc_id") === 0L, k = 5)
      .select($"qid", $"rnk", $"id").as[(Long, Long, Long)].collect().toSeq.sorted
    // candidates = docs sharing >= 1 shingle with doc 0, never itself
    assert(out.map(_._3).toSet == Set(1L, 2L))
    assert(out == Seq((0L, 1L, 1L), (0L, 2L, 2L)))
  }

  test("bm25MoreLikeThisFromIndex == bm25MoreLikeThis; no term exchange in the serve") {
    import spark.implicits._
    val docs = (0L until 30L).map { i =>
      val base = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      // rotate so neighbors share shingles; every 5th doc is short
      val words =
        if (i % 5 == 4) Seq("xy")
        else (0 until 5).map(j => base(((i + j) % base.size).toInt))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val path = graft.queries.Queries.scratchRoot + "/mlt-spec"
    val root = new org.apache.hadoop.fs.Path(path)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
    TextAnalysis.writeMltIndex(docs, path, "graft_mlt_spec", nBuckets = 4)
    val isq = col("doc_id") % 3 === 0
    val direct = TextAnalysis.bm25MoreLikeThis(docs, isq, k = 3)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    val served = TextAnalysis.bm25MoreLikeThisFromIndex(
        spark, path, "graft_mlt_spec", isq, k = 3)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    assert(served == direct)
    // the bucketed layout's point: query/candidate/df reads of the SAME
    // term-bucketed table join with ZERO term exchanges — the only hash
    // exchange in the serve is the final qid placement
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextAnalysis.bm25MoreLikeThisFromIndex(
        spark, path, "graft_mlt_spec", isq, k = 3)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning(term"),
        s"serve plan shuffles on term:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("redactPii counts and redacts emails/phones; clean text untouched") {
    val docs = Seq(
      (1L, "reach me at bob.smith@corp.example.org or +1-415-5550"),
      (2L, "two mails a@b.io c.d@e.co.uk and a call +1-212-0000 done"),
      (3L, "no pii here at all"),
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs)
      .select("doc_id", "n_emails", "n_phones", "redacted")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, "reach me at <EMAIL> or <PHONE>"),
      (2L, 2L, 1L, "two mails <EMAIL> <EMAIL> and a call <PHONE> done"),
      (3L, 0L, 0L, "no pii here at all"),
      (4L, 0L, 0L, "")))
  }

  test("WordPairs kernel: dedup, sort, empty-skip, hand-computed pairs") {
    graft.functions.CatalystExpressions.register(spark)
    val got = Seq(Tuple1("b a  b c a"), Tuple1("solo"), Tuple1(""))
      .toDF("t")
      .select(call_function("graft_word_pairs", split($"t", " ")).as("ps"))
      .as[Seq[(String, String)]].collect().toSeq
    assert(got == Seq(
      Seq(("a", "b"), ("a", "c"), ("b", "c")), // deduped + sorted
      Seq.empty,                               // one term -> no pairs
      Seq.empty))                              // empty text -> no pairs
  }

  test("termLift equals a driver-side replay on a hand corpus") {
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "x z"), (4L, "y z"), (5L, "x y z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.termLift(docs, minDf = 1)
      .as[(String, String, Long, Long)].collect().toSet
    // n=5; df: x=4, y=4, z=3; pairs: xy=3, xz=2, yz=2
    def lift(nab: Long, na: Long, nb: Long) = ((nab * 1000000L) / na) * 5L / nb
    assert(got == Set(
      ("x", "y", 3L, lift(3, 4, 4)),
      ("x", "z", 2L, lift(2, 4, 3)),
      ("y", "z", 2L, lift(2, 4, 3))))
    // minDf prunes pairs whose either side is rare
    val pruned = TextAnalysis.termLift(docs, minDf = 4)
      .as[(String, String, Long, Long)].collect().toSet
    assert(pruned.map(p => (p._1, p._2)) == Set(("x", "y")))
  }
}
