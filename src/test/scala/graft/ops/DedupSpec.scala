package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.functions.TextFunctions

class DedupSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = "the quick brown fox jumps over the lazy dog again and again tonight"
  private val other = "completely different words in this one with nothing shared at all here"

  private def docs = Seq(
    (1L, base, "en"), (2L, nearDup, "en"), (3L, other, "en"),
    (4L, base, "en")) // exact dup of 1
    .toDF("doc_id", "text", "lang")

  test("exact dedup is idempotent and keeps one row per key") {
    val d1 = Dedup.exact(docs, Seq("text"))
    assert(d1.count() == 3)
    assert(Dedup.exact(d1, Seq("text")).count() == 3)
  }

  test("minhash LSH finds planted near-dups and reports exact Jaccard") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      shingleWidth = 3, k = 128, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // 1-4 exact (jac 1.0), 1-2 and 2-4 near (share most shingles), 3 isolated
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 4L), (1L, 2L), (2L, 4L)))
    assert(pairs.find(p => p._1 == 1L && p._2 == 4L).get._3 == 1.0)
    val j12 = pairs.find(p => p._1 == 1L && p._2 == 2L).get._3
    assert(j12 > 0.5 && j12 < 1.0)
  }

  test("minhash candidates equal brute-force pairs at high threshold") {
    // brute-force exact jaccard over word 3-gram shingle sets
    val sets = docs.select(col("doc_id"),
      TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val brute = sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.sh"), col("b.sh"))).cast("double"))
      .withColumn("jac", col("inter") /
        (size(col("a.sh")) + size(col("b.sh")) - col("inter")))
      .filter(col("jac") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(lsh == brute)
  }

  test("durable shingle index: full search from the lake equals the in-session result") {
    val fixture = spark.read.parquet(s"$sf0001/documents.parquet")
    val dir = s"/tmp/graft-test-dedup/index-${System.nanoTime()}"
    Dedup.writeShingleIndex(fixture, dir)
    val fromIndex = Dedup.minhashNearDupsFromIndex(spark, dir, threshold = 0.8)
      .collect().map(_.toSeq).toSeq
    val inSession = Dedup.minhashNearDups(fixture, "doc_id", "text",
      shingleWidth = 3, k = 128, bands = 32, threshold = 0.8)
      .collect().map(_.toSeq).toSeq
    assert(fromIndex.nonEmpty && fromIndex == inSession)
  }

  test("appendToShingleIndex: full search after append equals a from-scratch index") {
    val fixture = spark.read.parquet(s"$sf0001/documents.parquet")
    val dir = s"/tmp/graft-test-dedup/append-${System.nanoTime()}"
    val newPred = col("doc_id") % 7 === 0
    Dedup.writeShingleIndex(fixture.filter(!newPred), dir)
    Dedup.appendToShingleIndex(fixture.filter(newPred), dir)
    val appended = Dedup.minhashNearDupsFromIndex(spark, dir, threshold = 0.8)
      .collect().map(_.toSeq).toSeq
    val scratch = Dedup.minhashNearDups(fixture, "doc_id", "text",
      shingleWidth = 3, k = 128, bands = 32, threshold = 0.8)
      .collect().map(_.toSeq).toSeq
    assert(appended.nonEmpty && appended == scratch,
      "append must preserve the full pair set (no rebuild, no loss)")
  }

  test("deleteFromShingleIndex: serving after a takedown equals a fresh index over survivors") {
    val fixture = spark.read.parquet(s"$sf0001/documents.parquet")
    val dir = s"/tmp/graft-test-dedup/del-${System.nanoTime()}"
    Dedup.writeShingleIndex(fixture, dir)
    val gonePred = col("doc_id") % 7 === 0
    val goneIds = fixture.filter(gonePred).select(col("doc_id").as("id"))
    Dedup.deleteFromShingleIndex(spark, dir, goneIds)
    // a forgotten doc must stop surfacing as anyone's candidate: the
    // purged index serves exactly what a from-scratch index over the
    // surviving corpus would
    val served = Dedup.minhashNearDupsFromIndex(spark, dir, threshold = 0.8)
      .collect().map(_.toSeq).toSeq
    val scratch = Dedup.minhashNearDups(fixture.filter(!gonePred), "doc_id",
        "text", shingleWidth = 3, k = 128, bands = 32, threshold = 0.8)
      .collect().map(_.toSeq).toSeq
    assert(served == scratch)
    // and the postings/shingles themselves are gone, not just unserved
    val shIds = spark.read.parquet(s"$dir/shingles").select(col("id"))
      .as[Long].collect().toSet
    val bandIds = spark.read.parquet(s"$dir/bands").select(col("id"))
      .as[Long].collect().toSet
    assert(shIds.forall(_ % 7 != 0) && bandIds.forall(_ % 7 != 0))
    assert(shIds.nonEmpty && bandIds.nonEmpty)
  }

  test("incremental dedup against the index finds exactly the pairs touching the new batch") {
    val fixture = spark.read.parquet(s"$sf0001/documents.parquet")
    val dir = s"/tmp/graft-test-dedup/incr-${System.nanoTime()}"
    val newPred = col("doc_id") % 7 === 0
    Dedup.writeShingleIndex(fixture.filter(!newPred), dir)
    val incr = Dedup.minhashNearDupsAgainstIndex(spark, fixture.filter(newPred),
      dir, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // expected = the full pair set restricted to pairs with >= 1 new side
    // (LSH candidates are lossless at j >= 0.8; both paths verify exactly)
    val full = Dedup.minhashNearDups(fixture, "doc_id", "text",
      shingleWidth = 3, k = 128, bands = 32, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val expected = full.filter(p => p._1 % 7 == 0 || p._2 % 7 == 0)
    assert(incr == expected && incr.nonEmpty)
    // and nothing that is purely old x old
    assert(incr.forall(p => p._1 % 7 == 0 || p._2 % 7 == 0))
  }

  test("dedupSurvivorsFromIndex: survivors served from the lake equal the in-session loop") {
    val fixture = spark.read.parquet(s"$sf0001/documents.parquet")
    val dir = s"/tmp/graft-test-dedup/survivors-${System.nanoTime()}"
    Dedup.writeShingleIndex(fixture, dir)
    val fromIndex = Dedup.dedupSurvivorsFromIndex(spark, fixture, "doc_id", dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    val inSession = Dedup.dedupSurvivors(fixture, "doc_id",
      Dedup.minhashNearDups(fixture, "doc_id", "text",
        shingleWidth = 3, k = 128, bands = 32, threshold = 0.8))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(fromIndex.nonEmpty && fromIndex == inSession)
    // the loop actually dropped someone (the fixture has near-dups)
    assert(fromIndex.size < fixture.count())
  }

  test("connectedComponents: chain, triangle, pair, and cross-component isolation") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("da", "db")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(got == expected)
  }

  test("compactShingleIndex: fewer files, identical served pairs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val dir = s"/tmp/graft-test-dedup/compact-${System.nanoTime()}"
    Dedup.writeShingleIndex(docs.filter(col("doc_id") % 3 === 0), dir)
    Dedup.appendToShingleIndex(docs.filter(col("doc_id") % 3 === 1), dir)
    Dedup.appendToShingleIndex(docs.filter(col("doc_id") % 3 === 2), dir)
    val before = Dedup.minhashNearDupsFromIndex(spark, dir, 0.8)
      .collect().map(_.toSeq).toSeq
    def dataFiles(p: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).count(_.getName.endsWith(".parquet"))
    }
    val filesBefore = dataFiles(s"$dir/bands") + dataFiles(s"$dir/shingles")
    Dedup.compactShingleIndex(spark, dir)
    val filesAfter = dataFiles(s"$dir/bands") + dataFiles(s"$dir/shingles")
    assert(filesAfter < filesBefore,
      s"compaction did not reduce files ($filesBefore -> $filesAfter)")
    val after = Dedup.minhashNearDupsFromIndex(spark, dir, 0.8)
      .collect().map(_.toSeq).toSeq
    assert(after.nonEmpty && after == before,
      "compaction must not change served pairs")
  }

  test("connectedComponents: tuned loop == legacy loop, and session conf restored") {
    import spark.implicits._
    // r18: the propagation loop sizes its shuffles from round 0's
    // AQE-coalesced output and runs with AQE off; labeling must be
    // identical to the legacy (session-conf) loop on BOTH regimes —
    // dense near-dup clusters and the chain that exercises pointer
    // doubling — and the session conf must come back exactly.
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val dense = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("da", "db")
    val chain = (0L until 99L).map(i => (i, i + 1)).toDF("da", "db")
    for (pairs <- Seq(dense, chain)) {
      val legacy = Dedup.connectedComponentsMode(pairs, "da", "db", 50, tuneLoop = false)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val tuned = Dedup.connectedComponentsMode(pairs, "da", "db", 50, tuneLoop = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(tuned == legacy)
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore,
      "shuffle partitions not restored after the tuned loop")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == aqeBefore,
      "AQE flag not restored after the tuned loop")
  }

  test("connectedComponents: 1000-node chain converges in O(log n) rounds") {
    import spark.implicits._
    // worst case for plain min-label propagation (would need ~999
    // rounds); the pointer-doubling shortcut must close it within a
    // logarithmic budget — maxRounds = 15 > log2(1000) + slack, and the
    // require inside connectedComponents throws if it fails to converge
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("da", "db")
    val got = Dedup.connectedComponents(chain, maxRounds = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 1000 && got.forall(_._2 == 0L))
  }

  test("dedupSurvivors matches a union-find oracle on the real corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8)
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "corpus must contain near-dup pairs for this test")
    // test-side oracle: plain union-find over the same pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val losers = members.filter(m => find(m) != m).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val expectedSurvivors = allIds -- losers
    val got = Dedup.dedupSurvivors(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expectedSurvivors)
    assert(losers.nonEmpty, "expected some documents to be dropped")
  }

  test("simhash: identical docs collide, near-dups within hamming budget") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("da", "db", "hamming").as[(Long, Long, Long)].collect().toSeq
    val exact = pairs.find(p => p._1 == 1L && p._2 == 4L)
    assert(exact.exists(_._3 == 0)) // identical text -> identical signature
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L)) // unrelated doc stays out
  }

  test("replayable 60-bit simhash: same contract as the xxhash variant") {
    val pairs = Dedup.simhashNearDupsReplayable(docs, "doc_id", "text", maxHamming = 3)
      .select("da", "db", "hamming").as[(Long, Long, Long)].collect().toSeq
    val exact = pairs.find(p => p._1 == 1L && p._2 == 4L)
    assert(exact.exists(_._3 == 0))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
    // signatures stay within 60 bits
    val sigs = docs.select(
      call_function("graft_simhash60", split(col("text"), " ")).as("sig"))
      .as[Long].collect()
    assert(sigs.forall(s => s >= 0L && s < (1L << 60)))
  }

  test("ngram jaccard with prefix filtering equals naive all-pairs") {
    val shingle = TextFunctions.wordShingles(_: org.apache.spark.sql.Column, 2)
    val filtered = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang",
      shingle, threshold = 0.3)
      .select("da", "db", "jac").as[(Long, Long, Double)].collect().toSet
    val sets = docs.select(col("doc_id"), col("lang"), shingle(col("text")).as("sh"))
    val naive = sets.as("a").join(sets.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.sh"), col("b.sh"))).cast("double"))
      .withColumn("jac", round(col("inter") /
        (size(col("a.sh")) + size(col("b.sh")) - col("inter")), 6))
      .filter(col("jac") >= 0.3)
      .select(col("a.doc_id"), col("b.doc_id"), col("jac"))
      .as[(Long, Long, Double)].collect().toSet
    assert(filtered == naive)
    assert(naive.nonEmpty)
  }

  test("ngram jaccard prefix filter is lossless on random corpora (seeded)") {
    val rnd = new scala.util.Random(0x5EED1E55L)
    val vocab = ('a' to 'p').map(_.toString)
    val shingle = TextFunctions.wordShingles(_: org.apache.spark.sql.Column, 2)
    for (trial <- 1 to 8) {
      val threshold = Seq(0.2, 0.5, 0.8)(rnd.nextInt(3))
      val nDocs = 10 + rnd.nextInt(30)
      // near-dup structure: half the docs are noisy copies of a template
      val template = Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
      val rows = (0 until nDocs).map { i =>
        val words =
          if (rnd.nextBoolean()) template.map(w =>
            if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(vocab.size)) else w)
          else Seq.fill(5 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        (i.toLong, words.mkString(" "), if (rnd.nextInt(4) == 0) "fr" else "en")
      }
      val df = rows.toDF("doc_id", "text", "lang")
      val filtered = Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang",
        shingle, threshold)
        .select("da", "db", "jac").as[(Long, Long, Double)].collect().toSet
      val sets = df.select(col("doc_id"), col("lang"), shingle(col("text")).as("sh"))
      val naive = sets.as("a").join(sets.as("b"),
          col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
        .withColumn("inter", size(array_intersect(col("a.sh"), col("b.sh"))).cast("double"))
        .withColumn("jac", round(col("inter") /
          (size(col("a.sh")) + size(col("b.sh")) - col("inter")), 6))
        .filter(col("jac") >= threshold)
        .select(col("a.doc_id"), col("b.doc_id"), col("jac"))
        .as[(Long, Long, Double)].collect().toSet
      assert(filtered == naive, s"trial $trial t=$threshold n=$nDocs")
    }
  }

  test("lang blocking keeps cross-block pairs out") {
    val mixed = Seq((1L, base, "en"), (2L, base, "fr")).toDF("doc_id", "text", "lang")
    val pairs = Dedup.ngramJaccardPairs(mixed, "doc_id", "text", "lang",
      TextFunctions.wordShingles(_, 2), threshold = 0.1)
    assert(pairs.count() == 0)
  }

  test("AQE skew-join split fires on a hot-shingle posting group (documented df-skew handoff)") {
    // 1000 docs that all share their lexicographically-FIRST shingle, each
    // with a unique tail: the hot shingle's posting list lands in one
    // shuffle partition of the candidate join, several times the median —
    // the exact frequent-shingle hotspot ngramJaccardPairs hands to AQE
    val nDocs = 1000
    val hot = (1 to nDocs).map { i =>
      (i.toLong, s"aa aa aa aa aa u$i v$i w$i x$i y$i", "en")
    }.toDF("doc_id", "text", "lang")
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      // test-scaled detection thresholds (production keeps the defaults —
      // 256MB/5.0 — which a real hot posting list crosses the same way)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      // keep the shuffle_hash join a real shuffle join: AQE must not
      // demote the small test corpus to broadcast
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // the skew claim is about the CANDIDATE posting join specifically —
      // run the operator's own candidate stage (ngramCandidates) and count
      // it in one plan, so the hot-group pair explosion never reaches a
      // driver collect
      val sets = hot.select(col("doc_id").as("id"), col("lang").as("blk"),
        TextFunctions.wordShingles(col("text"), 5).as("sh"))
      val counted = Dedup.ngramCandidates(sets, 0.5).agg(count(lit(1)).as("n"))
      // collect() on THIS Dataset (count() would build its own
      // QueryExecution) so its adaptive plan executes and finalizes
      val n = counted.collect().head.getLong(0)
      assert(n == nDocs.toLong * (nDocs - 1) / 2,
        "every hot-group pair must be a candidate exactly once")
      // the candidate join executes inside nested query stages: flatten
      // every materialized stage's plan before searching for the marker
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      def planStrings(p: SparkPlan): Seq[String] =
        p.toString +: p.collect { case s: QueryStageExec => s.plan }.flatMap(planStrings)
      val plan = planStrings(counted.queryExecution.executedPlan).mkString("\n")
      assert(plan.contains("isFinalPlan=true"), s"plan did not finalize:\n$plan")
      assert(plan.contains("skew=true"),
        s"expected an OptimizeSkewedJoin split (skew=true) on the posting join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("chunkExactDups: non-overlapping tiling, cross-doc duplicates only") {
    val corpus = Seq(
      (1L, "a b c d e f g"),   // chunks: "a b c", "d e f" (g = tail, dropped)
      (2L, "a b c x y z"),     // chunks: "a b c", "x y z"
      (3L, "x y z x y z"),     // chunks: "x y z" twice (same doc)
      (4L, "p q"),             // shorter than width -> no chunks
      (5L, "")).toDF("doc_id", "text")
    val got = Dedup.chunkExactDups(corpus, "doc_id", "text", width = 3)
      .orderBy("chunk")
      .as[(String, Long, Long)].collect().toSeq
    // "a b c" in docs 1+2; "x y z" in docs 2+3 with 3 occurrences (doc 3
    // repeats it — n_occurrences counts tiles, n_docs counts documents);
    // "d e f" appears once -> excluded; within-doc-only repeats would
    // still surface via n_docs=1 ... which the n_docs>1 filter drops
    assert(got == Seq(("a b c", 2L, 2L), ("x y z", 2L, 3L)))
  }

  test("chunkExactDups matches a naive recount on the real corpus") {
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
    val width = 3
    val naive = real.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .as[(Long, Seq[String])].collect()
      .flatMap { case (id, ws) =>
        ws.grouped(width).filter(_.size == width).map(c => (id, c.mkString(" ")))
      }
    val byChunk = naive.groupBy(_._2).map { case (c, occ) =>
      (c, occ.map(_._1).distinct.size.toLong, occ.size.toLong)
    }.filter(_._2 > 1).toSet
    val got = Dedup.chunkExactDups(real, "doc_id", "text", width)
      .as[(String, Long, Long)].collect().toSet
    assert(got == byChunk)
    assert(got.nonEmpty, "expected shared chunks in the test corpus")
  }

  // polyHash("x") = 120 and polyHash("go") = 3304 are ≡ 0 (mod 8):
  // boundaries fall after those words, everything else continues a chunk.
  test("cdcChunkDups: boundary rule, trailing chunk, minWords filter") {
    val corpus = Seq(
      (1L, "a b x c d go e"), // chunks: "a b x" | "c d go" | "e" (1 word, filtered)
      (2L, "a b x c d go"),   // chunks: "a b x" | "c d go"
      (3L, "q a b x")         // one chunk "q a b x" — prefix differs, so
      ).toDF("doc_id", "text") // it shares NOTHING with doc 1/2's first chunk
    val got = Dedup.cdcChunkDups(corpus, "doc_id", "text", divisor = 8,
        minWords = 2)
      .orderBy("chunk").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a b x", 2L, 2L), ("c d go", 2L, 2L)))
  }

  test("cdcChunkDups re-synchronizes after an insertion where fixed tiling loses everything") {
    val base = "a b x c d go e f x y z"
    val corpus = Seq((1L, base), (2L, "ins " + base)).toDF("doc_id", "text")
    // CDC: the inserted word only perturbs the chunk it lands in — every
    // chunk after the first boundary is shared verbatim
    val cdc = Dedup.cdcChunkDups(corpus, "doc_id", "text", divisor = 8,
        minWords = 2)
      .orderBy("chunk").as[(String, Long, Long)].collect().toSeq
    assert(cdc == Seq(("c d go", 2L, 2L), ("e f x", 2L, 2L), ("y z", 2L, 2L)))
    // fixed tiling: the same insertion shifts every later tile by one
    // word — zero shared tiles (the shift-robustness gap q176 closes)
    val fixed = Dedup.chunkExactDups(corpus, "doc_id", "text", width = 3)
      .collect()
    assert(fixed.isEmpty)
  }

  test("cdcChunkDups matches a naive driver-side replay on the real corpus") {
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
    def polyHash(w: String): Long =
      w.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    val naive = real.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        val chunks = scala.collection.mutable.ArrayBuffer.empty[String]
        val cur = scala.collection.mutable.ArrayBuffer.empty[String]
        text.split(" ", -1).foreach { w =>
          cur += w
          if (polyHash(w) % 8 == 0) { chunks += cur.mkString(" "); cur.clear() }
        }
        if (cur.nonEmpty) chunks += cur.mkString(" ")
        chunks.filter(_.split(" ", -1).length >= 2).map(c => (id, c))
      }
    val expected = naive.groupBy(_._2).map { case (c, occ) =>
      (c, occ.map(_._1).distinct.size.toLong, occ.size.toLong)
    }.filter(_._2 > 1).toSet
    val got = Dedup.cdcChunkDups(real, "doc_id", "text", divisor = 8,
        minWords = 2)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty, "expected shared CDC chunks in the test corpus")
  }

  test("fuzzyLinkPairs: distinct-first, blocked, thresholded, counted") {
    val recs = Seq(
      "red bolt", "red bolt", "red bolt", // 3 records of one value
      "ted bolt",                         // dist 1 to red bolt, same block
      "red ring",                         // different block: never compared
      "blue bolt",                        // dist 3 to red bolt: over threshold
      "ted ring", "ted ring"              // dist 1 to red ring, same block
    ).toDF("nm")
    val got = Dedup.fuzzyLinkPairs(recs, "nm",
        org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("nm"), " "), 2), maxDist = 2)
      .as[(String, String, Long, Long, Long)].collect().sorted.toSeq
    // blue bolt is in the bolt block but lev("blue bolt","ted bolt") = 4
    // and lev("blue bolt","red bolt") = 3 - both over the threshold;
    // red ring vs red/ted bolt are never even compared (different block)
    assert(got == Seq(
      ("red bolt", "ted bolt", 1L, 3L, 1L),
      ("red ring", "ted ring", 1L, 1L, 2L)))
  }

  test("fuzzyDecontaminate: bipartite pairs only, equals brute force, " +
    "within-side near-dups invisible") {
    val train = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val bench = Seq((100L, base), (101L, "an utterly unrelated benchmark " +
      "sentence about mountains rivers and weather patterns")).toDF("doc_id", "text")
    val got = Dedup.fuzzyDecontaminate(train, bench, "doc_id", "text",
        threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    // brute-force bipartite word-3-gram jaccard at the same threshold
    def sets(df: org.apache.spark.sql.DataFrame, side: String) =
      df.select(col("doc_id").as(s"${side}_id"),
        TextFunctions.wordShingles(col("text"), 3).as(s"sh_$side"))
    val brute = sets(train, "train").crossJoin(sets(bench, "bench"))
      .withColumn("inter",
        size(array_intersect(col("sh_train"), col("sh_bench"))).cast("double"))
      .withColumn("jac", col("inter") /
        (size(col("sh_train")) + size(col("sh_bench")) - col("inter")))
      .filter(col("jac") >= 0.5)
      .select(col("train_id"), col("bench_id"))
      .as[(Long, Long)].collect().toSet
    assert(got.map(p => (p._1, p._2)).toSet == brute)
    // docs 1-2 are near-dups WITHIN train: a within-side pair must never
    // surface; doc 100 (= doc 1's text) is the only cross-side hit, from
    // both its train-side near-dups
    assert(got.map(p => (p._1, p._2)).toSet == Set((1L, 100L), (2L, 100L)))
    assert(got.find(_._1 == 1L).get._3 == 1.0)
  }

  test("incrementalComponents equals from-scratch components for any " +
    "old/new edge split (seeded random graphs)") {
    val rnd = new scala.util.Random(0x1CC5EEDL)
    val nodes = (0L until 60L).toSeq
    val edges = Seq.fill(50)((nodes(rnd.nextInt(60)), nodes(rnd.nextInt(60))))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val full = Dedup.connectedComponents(edges.toDF("da", "db"))
      .as[(Long, Long)].collect().toSet
    // three splits: balanced, all-new (empty prior), all-old (empty batch)
    Seq[((Long, Long)) => Boolean](
      e => (e._1 + e._2) % 2 == 0, _ => false, _ => true
    ).foreach { isOld =>
      val oldEdges = edges.filter(isOld)
      val newEdges = edges.filterNot(isOld)
      val priorCc =
        if (oldEdges.isEmpty) Seq.empty[(Long, Long)].toDF("id", "lbl")
        else Dedup.connectedComponents(oldEdges.toDF("da", "db"))
      val labels = nodes.toDF("id")
        .join(priorCc.withColumnRenamed("lbl", "plbl"), Seq("id"), "left")
        .select(col("id"), coalesce(col("plbl"), col("id")).as("lbl"))
      val inc = Dedup.incrementalComponents(labels,
          newEdges.toDF("da", "db"), keepSingletons = false)
        .as[(Long, Long)].collect().toSet
      assert(inc == full, s"split ${oldEdges.size}/${newEdges.size}")
      // keepSingletons = true additionally self-labels every untouched id
      val withSingles = Dedup.incrementalComponents(labels,
          newEdges.toDF("da", "db"))
        .as[(Long, Long)].collect().toMap
      assert(withSingles.keySet == nodes.toSet)
      nodes.filterNot(n => full.exists(_._1 == n)).foreach(n =>
        assert(withSingles(n) == n, s"singleton $n must keep its self label"))
    }
  }

  test("goldenRecords: per-field survivorship rules, singletons excluded") {
    // cluster {1,2,3}: text from 2 (longest), lang mode en (2 of 3),
    // source priority min suffix = src0 (on doc 3); cluster {10,11}:
    // equal sizes tie -> lower id 10's text, lang tie -> max value
    // ("fr" > "de"), source tie (both src5) -> doc 10's. doc 99 is a
    // singleton and must not appear.
    val docs = Seq(
      (1L, "aa", 2L, "en", "src7"),
      (2L, "aaaa", 4L, "en", "src2"),
      (3L, "aaa", 3L, "de", "src0"),
      (10L, "xx", 2L, "de", "src5"),
      (11L, "yy", 2L, "fr", "src5"),
      (99L, "zz", 2L, "zh", "src9"))
      .toDF("doc_id", "text", "n_chars", "lang", "source")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
    val got = Dedup.goldenRecords(docs, "doc_id", pairs,
        priorityCol = substring(col("source"), 4, 10).cast("int"))
      .as[(Long, Long, Long, String, String, String)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 1L, "aaaa", "en", "src0"),
      (10L, 2L, 10L, "xx", "fr", "src5")))
  }

  test("fuzzyDecontaminate: an id present on both sides self-pairs at jac 1") {
    val train = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    val bench = Seq((1L, base)).toDF("doc_id", "text")
    val got = Dedup.fuzzyDecontaminate(train, bench, "doc_id", "text",
        threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 1.0)))
  }

  // driver-side exact twin for exactSubstringPairs: longest common token
  // substring per pair, pairs kept when it reaches L
  private def bruteSpans(corpus: Seq[(Long, String)],
      L: Int): Seq[(Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1) }
    for {
      (ia, a) <- toks; (ib, b) <- toks
      if ia < ib
      best = (for (i <- a.indices; j <- b.indices if a(i) == b(j)) yield {
        var l = 0
        while (i + l < a.length && j + l < b.length && a(i + l) == b(j + l))
          l += 1
        l
      }).maxOption.getOrElse(0)
      if best >= L
    } yield (ia, ib, best.toLong)
  }

  test("exactSubstringPairs equals the brute-force LCS twin; sub-L overlaps rejected") {
    val span8 = "alpha beta gamma delta epsilon zeta eta theta"   // 8 tokens
    val span15 = (1 to 15).map(i => s"s$i").mkString(" ")
    val span7 = "one two three four five six seven"               // 7 < L
    val rnd = new scala.util.Random(0xDED0BEEFL)
    val vocab = (0 until 25).map(i => s"w$i")
    def noise(n: Int) =
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val corpus: Seq[(Long, String)] = Seq(
      1L -> s"${noise(10)} $span8 ${noise(12)}",
      2L -> s"${noise(7)} $span8 ${noise(5)}",      // exactly-8 span pair
      3L -> s"$span15 ${noise(20)}",
      4L -> s"${noise(3)} $span15",                 // 15-token span pair
      5L -> s"${noise(15)} $span7 ${noise(15)}",    // shares k-grams with 6
      6L -> s"$span7 ${noise(9)}",                  // but no >=8 span: no pair
      7L -> "tiny doc",                             // shorter than L: excluded
      8L -> s"${noise(30)}"                         // random filler
    ) ++ (9L to 30L).map(i => i -> noise(20 + rnd.nextInt(40)))
    val docs = corpus.toDF("doc_id", "text")
    val got = Dedup.exactSubstringPairs(docs, "doc_id", "text",
        minSpanTokens = 8)
      .as[(Long, Long, Long)].collect().toSeq
    val want = bruteSpans(corpus, 8).sortBy(p => (p._1, p._2))
    assert(got == want)
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 8L))
    assert(got.exists(p => p._1 == 3L && p._2 == 4L && p._3 == 15L))
    assert(!got.exists(p => p._1 == 5L && p._2 == 6L),
      "a 7-token overlap must be rejected by the verify stage")
  }

  test("exactSubstringPairs: empty tokens from double spaces follow the split convention; three-way spans pair all sides") {
    // the shared span contains a DOUBLE space -> an empty token inside
    // the span on both sides; split(' ') keeps it, so the span certifies
    val shared = "a b c  d e f g h i" // 10 tokens incl. one empty
    val corpus = Seq(
      1L -> s"x1 x2 $shared y1",
      2L -> s"z1 $shared",
      3L -> s"$shared q1 q2")
    val docs = corpus.toDF("doc_id", "text")
    val got = Dedup.exactSubstringPairs(docs, "doc_id", "text",
        minSpanTokens = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == bruteSpans(corpus, 8).sortBy(p => (p._1, p._2)))
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got.forall(_._3 >= 10L))
  }

  test("lineDedupReconstitute: order preserved, threshold boundary exact, " +
      "tail kept, fully-boilerplate doc re-emitted empty") {
    // width=3 lines; "b1 b2 b3" planted in docs 1,2,3 (>= minDocs=2 ->
    // dropped everywhere); "u1 u2 u3" appears only in doc 1 (kept: exactly
    // minDocs-1 documents — the threshold boundary). Doc 1 interleaves
    // boilerplate between unique lines so reconstitution order is
    // observable; doc 3 is ONLY boilerplate; doc 4 has a 2-word tail.
    val corpus = Seq(
      1L -> "u1 u2 u3 b1 b2 b3 v1 v2 v3",
      2L -> "w1 w2 w3 b1 b2 b3",
      3L -> "b1 b2 b3",
      4L -> "x1 x2 x3 t1 t2") // tail line "t1 t2" must survive intact
    val out = Dedup.lineDedupReconstitute(corpus.toDF("doc_id", "text"),
        "doc_id", "text", width = 3, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "u1 u2 u3 v1 v2 v3", 2L, 1L), // middle boilerplate excised, order kept
      (2L, "w1 w2 w3", 1L, 1L),
      (3L, "", 0L, 1L),                  // fully-boilerplate doc still present
      (4L, "x1 x2 x3 t1 t2", 2L, 0L)))   // short tail preserved verbatim
  }

  test("lineDedupReconstitute is the identity on a corpus with no shared lines") {
    val corpus = Seq(1L -> "a b c d e", 2L -> "f g h i j").toDF("doc_id", "text")
    val out = Dedup.lineDedupReconstitute(corpus, "doc_id", "text",
        width = 3, minDocs = 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq((1L, "a b c d e", 2L, 0L), (2L, "f g h i j", 2L, 0L)))
  }
}
