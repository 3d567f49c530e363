package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class CurationSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("assignSplit is exhaustive, deterministic, and stable under corpus growth") {
    val split = Curation.assignSplit(docs, "doc_id")
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == docs.count())
    // roughly 80/10/10 (hash noise allowed)
    val total = counts.values.sum.toDouble
    assert(counts("train") / total > 0.7 && counts("train") / total < 0.9)
    // stability: the same doc keeps its split when the corpus is a subset
    val subset = Curation.assignSplit(docs.filter($"doc_id" % 3 === 0), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    subset.foreach { case (id, s) => assert(full(id) == s, s"doc $id migrated") }
  }

  test("clusterAwareSplit: components share one split, singletons match assignSplit") {
    // components: {1,2,3} (chain), {10,11}; singletons: 20, 21, 22
    val corpus = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
    val out = Curation.clusterAwareSplit(corpus, "doc_id", pairs)
      .select($"doc_id", $"cluster_key", $"split")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    // whole component -> one split, keyed by the min id
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(byId(_)._3).distinct.size == 1)
    assert(Seq(10L, 11L).map(byId(_)._2).distinct == Seq(10L))
    assert(Seq(10L, 11L).map(byId(_)._3).distinct.size == 1)
    // singletons: cluster_key = own id, split identical to the plain split
    val plain = Curation.assignSplit(corpus, "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    Seq(20L, 21L, 22L).foreach { id =>
      assert(byId(id)._2 == id && byId(id)._3 == plain(id))
    }
    // cluster members take the split of their min-id representative
    assert(byId(1L)._3 == plain(1L) && byId(10L)._3 == plain(10L))
    // exhaustive and typed
    assert(out.size == 8 && out.forall(r => Set("train", "val", "test")(r._3)))
  }

  test("idHash never overflows/goes negative for any non-negative long id") {
    val huge = Seq(0L, 1L, 2147483647L, 2147483648L, 3470000000L,
      4294967296L, Long.MaxValue).toDF("id")
    val hashes = huge.select(Curation.idHash(col("id")).as("h"))
      .as[Long].collect()
    assert(hashes.forall(h => h >= 0L && h < 4294967296L),
      s"hash left [0, 2^32): ${hashes.mkString(",")}")
    // splits on a giant-id corpus stay valid (the pre-fix multiply
    // wrapped negative from id ≈ 3.47e9 and routed everything to train)
    val giant = Curation.assignSplit(
      docs.withColumn("doc_id", col("doc_id") + 4000000000L), "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(giant.keySet.size == 3, s"expected all three splits, got $giant")
  }

  test("balancedSample caps every group at keep, keeps small groups whole") {
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val keep = 40
    val sampled = Curation.balancedSample(docs, "lang", "doc_id", keep)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (lang, n) =>
      assert(sampled(lang) == math.min(n, keep.toLong), s"lang $lang")
    }
    // deterministic: same selection twice
    val a = Curation.balancedSample(docs, "lang", "doc_id", keep)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Curation.balancedSample(docs, "lang", "doc_id", keep)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("decontaminate flags exactly the train docs overlapping the bench set") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated training text with fresh tokens only"),
      (3L, "another clean document nothing shared with benchmarks here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "students saw the quick brown fox jumps over a fence")
    ).toDF("doc_id", "text")
    val flagged = Curation.decontaminate(train, bench, "doc_id", "text", width = 5)
      .as[Long].collect().toSet
    // doc 1 shares the 5-gram "the quick brown fox jumps"; 2 and 3 are clean
    assert(flagged == Set(1L))
    // a clean pipeline drops flagged docs with a left_anti join
    val clean = train.join(
      Curation.decontaminate(train, bench, "doc_id", "text", 5),
      Seq("doc_id"), "left_anti")
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("packBins: overshoot bounded by one straddler; cumulative totals reach each bin's window") {
    val budget = 512L
    val packed = Curation.packBins(docs, "lang", "doc_id",
      size(split(col("text"), " ")), budget)
    val bins = packed.groupBy("lang", "bin")
      .agg(sum("toks").as("toks"), max("toks").as("max_doc"))
      .select($"lang", $"bin".as[Long], $"toks".as[Long], $"max_doc".as[Long])
      .as[(String, Long, Long, Long)].collect()
    bins.groupBy(_._1).foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._2 == 0L, s"$lang first bin must be 0")
      // overshoot bound: a bin never exceeds budget + its largest doc
      sorted.foreach { case (_, bin, toks, maxDoc) =>
        assert(toks < budget + maxDoc, s"$lang bin $bin overshot by ≥ one doc")
      }
      // cumulative bound: tokens through bin b reach the NEXT nonempty
      // bin's start offset (under-full bins only exist where a previous
      // straddler ate their window — the cumulative view proves no
      // budget capacity was skipped)
      var cum = 0L
      sorted.toSeq.sliding(2).foreach {
        case Seq((_, _, toks, _), (_, nextBin, _, _)) =>
          cum += toks
          assert(cum >= nextBin * budget,
            s"$lang: cumulative $cum below bin $nextBin's window start")
        case _ => ()
      }
    }
    // total preservation: every doc lands in exactly one bin
    assert(packed.count() == docs.count())
  }

  test("capPerGroup equals the plain window top-k for any salt count") {
    val scored = docs.withColumn("score", TextAnalysis.qualityScore(col("text")))
    val plain = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("score").desc, col("doc_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select("source", "rnk", "doc_id").as[(String, Long, Long)]
        .collect().toSet
    }
    for (salts <- Seq(1, 3, 16)) {
      val got = Curation.capPerGroup(scored, "source", "doc_id",
          col("score"), k = 5, salts = salts)
        .select("source", "rnk", "doc_id").as[(String, Long, Long)]
        .collect().toSet
      assert(got == plain, s"salts=$salts diverged from the plain window")
    }
    // caps hold and small groups survive whole
    val sizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val capped = Curation.capPerGroup(scored, "source", "doc_id", col("score"), 5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (src, n) =>
      assert(capped(src) == math.min(n, 5L), s"source $src")
    }
  }

  test("filterFunnel: first-fail verdicts, counts partition the corpus") {
    val rows = Seq(
      (1L, "short", "en"),       // fails r1 (and would fail r2) -> r1
      (2L, "a a a a a a", "en"), // long enough, low ttr -> r2
      (3L, "a b c d e f", "zh"), // passes r1/r2, wrong lang -> r3
      (4L, "a b c d e f", "en")) // pass
      .toDF("doc_id", "text", "lang")
    val ws = split(col("text"), " ")
    val rules = Seq(
      "r1_short" -> (size(ws) >= 3),
      "r2_ttr" -> (size(array_distinct(ws)).cast("double") / size(ws) >= 0.5),
      "r3_lang" -> col("lang").isin("en"))
    val got = Curation.filterFunnel(rows, rules)
      .as[(String, Long)].collect().toMap
    assert(got == Map("r1_short" -> 1L, "r2_ttr" -> 1L, "r3_lang" -> 1L, "pass" -> 1L))
    assert(got.values.sum == rows.count())
    // applyFunnel returns exactly the 'pass' rows
    val survivors = Curation.applyFunnel(rows, rules)
      .select("doc_id").as[Long].collect().toSeq
    assert(survivors == Seq(4L))
  }

  test("segmentDocs: windows cover every word with exact stride overlap") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
    val width = 10
    val stride = 7
    val segs = Curation.segmentDocs(docs, "doc_id", "text", width, stride)
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(segs.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      val words = text.split(" ", -1).toSeq
      val got = segs(id)
      // each window is exactly the slice [i*stride, i*stride+width)
      got.zipWithIndex.foreach { case (seg, i) =>
        val expect = words.slice(i * stride, math.min(i * stride + width, words.length))
        assert(seg.split(" ", -1).toSeq == expect, s"doc $id window $i")
      }
      // coverage: the last window reaches the end of the document
      val lastStart = (got.size - 1) * stride
      assert(lastStart + width >= words.length, s"doc $id uncovered tail")
      // minimality: one fewer window would leave a tail uncovered (or is
      // the single mandatory window)
      assert(got.size == 1 || (got.size - 2) * stride + width < words.length,
        s"doc $id emitted a redundant window")
    }
  }

  test("shuffleShards: deterministic, complete, seed-sensitive, shard-parallel") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = docs.count()
    val a = Curation.shuffleShards(docs, "doc_id", 8, 12345L)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._3))
    // complete permutation: every doc exactly once, positions 1..count
    // within each shard, every shard populated
    assert(a.length == n && a.map(_._1).distinct.length == n)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"shard $shard")
    }
    assert(a.map(_._2).distinct.length == 8)
    // deterministic across runs; a different seed is a different order
    val b = Curation.shuffleShards(docs, "doc_id", 8, 12345L)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._3))
    assert(a.toSeq == b.toSeq)
    val c = Curation.shuffleShards(docs, "doc_id", 8, 777L)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._3))
    assert(a.map(_._1).toSeq != c.map(_._1).toSeq, "seed must change the order")
    // scale shape: the ranking window is keyed by shard, never a global
    // single-partition sort
    val plan = Curation.shuffleShards(docs, "doc_id", 8, 12345L)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("filterFunnel: NULL predicate fails the rule in funnel and filter alike") {
    // null lang: isin evaluates to NULL — the funnel must charge the row
    // to r_lang (not let it fall through to 'pass') and applyFunnel must
    // drop it, so counts and survivors stay a consistent partition
    val rows = Seq((1L, "a b c", "en"), (2L, "a b c", null))
      .toDF("doc_id", "text", "lang")
    val rules = Seq("r_lang" -> col("lang").isin("en"))
    val got = Curation.filterFunnel(rows, rules)
      .as[(String, Long)].collect().toMap
    assert(got == Map("r_lang" -> 1L, "pass" -> 1L))
    val survivors = Curation.applyFunnel(rows, rules)
      .select("doc_id").as[Long].collect().toSeq
    assert(survivors == Seq(1L))
  }

  test("rendezvousRoute: the minimal-disruption property on add/remove") {
    val ids = (1L to 2000L).toDF("doc_id")
    val base = Seq("s1", "s2", "s3")
    def route(shards: Seq[String]): Map[Long, String] =
      Curation.rendezvousRoute(ids, "doc_id", shards)
        .as[(Long, String)].collect().toMap
    val r3 = route(base)
    // roughly balanced: each shard gets a nontrivial share
    val shares = r3.values.groupBy(identity).view.mapValues(_.size).toMap
    base.foreach(s => assert(shares(s) > 2000 / 6, s"$s starved: $shares"))

    // ADD a shard: a row either keeps its shard or moves to the NEW one
    val r4 = route(base :+ "s4")
    val moved = r3.keys.filter(id => r4(id) != r3(id))
    assert(moved.forall(id => r4(id) == "s4"))
    // the new shard takes roughly 1/4 (loose bounds)
    assert(moved.size > 2000 / 8 && moved.size < 2000 / 2, moved.size)

    // REMOVE a shard: only its rows move, everyone else stays put
    val r2 = route(base.filterNot(_ == "s2"))
    r3.foreach { case (id, sh) =>
      if (sh == "s2") assert(r2(id) != "s2")
      else assert(r2(id) == sh, s"row $id moved needlessly")
    }
    // single shard routes everything to it
    assert(route(Seq("only")).values.toSet == Set("only"))
  }

  test("budgetSelect: salted two-phase selection equals the plain window; " +
    "budget respected; salts=1 degenerates identically") {
    import org.apache.spark.sql.expressions.Window
    val score = TextAnalysis.qualityScore(col("text"))
    val toks = size(split(col("text"), " ")).cast("long")
    val got = Curation.budgetSelect(docs, "source", "doc_id", score, toks,
        budget = 800L)
      .select("source", "doc_id", "tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(got.nonEmpty)
    // the unsalted single-window reference the oracle also replays
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__s").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs.withColumn("__s", score).withColumn("__t", toks)
      .filter(col("__t") >= 1)
      .withColumn("__cum", sum(col("__t")).over(w))
      .filter(col("__cum") <= 800L)
      .select(col("source"), col("doc_id"), col("__t"), col("__cum"))
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(got == ref)
    // each source's selected tokens fit the budget, and selection is
    // partial (the budget actually binds on this corpus)
    val bySrc = got.groupBy(_._1)
    assert(bySrc.values.forall(_.map(_._3).sum <= 800L))
    assert(got.size < docs.filter(col("text").isNotNull).count())
    // degenerate salting changes nothing
    val one = Curation.budgetSelect(docs, "source", "doc_id", score, toks,
        budget = 800L, salts = 1)
      .select("source", "doc_id", "tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(one == got)
    // output is exactly the documented projection — nothing leaks through
    assert(Curation.budgetSelect(docs, "source", "doc_id", score, toks,
      budget = 800L).columns.toSeq ==
      Seq("source", "doc_id", "score", "tokens", "cum_tokens"))
    // reserved-name collisions are rejected up front, not silently shadowed
    val ex = intercept[IllegalArgumentException] {
      Curation.budgetSelect(docs.withColumn("tokens", lit(1L)),
        "source", "doc_id", score, toks, budget = 800L)
    }
    assert(ex.getMessage.contains("tokens"))
  }

  test("quantileNormalize: pooled percentile_disc mapping, seeded replay") {
    // hand case: group a = {10, 20}, group b = {30, 40}; pooled sorted
    // = [10, 20, 30, 40], N = 4. a's rank-1 of 2 -> p = ceil(1*4/2) = 2
    // -> 20; a's rank 2 -> p = 4 -> 40; same for b.
    val hand = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
      .toDF("id", "g", "u")
    val gotHand = Curation.quantileNormalize(hand, "id", "g", "u")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(gotHand == Seq((1L, "a", 10L, 20L), (2L, "a", 20L, 40L),
      (3L, "b", 30L, 20L), (4L, "b", 40L, 40L)))

    // seeded replay vs a driver-side reference (ties included: small
    // unit domain forces duplicate units within and across groups)
    val rnd = new scala.util.Random(0xCA11B8L)
    val rows = (1 to 300).map(i =>
      (i.toLong, "g" + rnd.nextInt(4), rnd.nextInt(20).toLong))
    val pooled = rows.map(_._3).sorted
    val byG = rows.groupBy(_._2)
    val want = rows.map { case (id, g, u) =>
      val members = byG(g).sortBy(r => (r._3, r._1))
      val r = members.indexWhere(_._1 == id) + 1
      val p = (r.toLong * pooled.length + members.length - 1) / members.length
      (id, g, u, pooled(p.toInt - 1))
    }.sortBy(_._1)
    val got = Curation.quantileNormalize(rows.toDF("id", "g", "u"), "id", "g", "u")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
    // each row maps to exactly one pooled value (banded join lossless)
    assert(got.size == rows.size)

    // plan audit: the only nested loops are the TWO broadcast 1-row
    // stats crosses; the p->value lookup itself is a hash equi-join on
    // the band key (the whole point of the banding rewrite)
    val plan = Curation.quantileNormalize(rows.toDF("id", "g", "u"),
      "id", "g", "u").queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 2,
      plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
