package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class SimilaritySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // four unit-ish vectors: 0 and 1 nearly parallel, 2 orthogonal, 3 opposite
  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("withNorm computes the L2 norm") {
    val n = Similarity.withNorm(emb).filter(col("vec_id") === 0L)
      .select("nrm").as[Double].head()
    assert(math.abs(n - 1.0) < 1e-9)
  }

  test("bruteForceTopK ranks by cosine with id tie-break") {
    val e = Similarity.withNorm(emb)
    val queries = e.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val corpus = e.select(col("vec_id").as("neighbor"), col("v").as("nv"), col("nrm").as("nnrm"))
    val top = Similarity.bruteForceTopK(corpus, queries, 3)
      .orderBy("rnk").select("neighbor").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L, 3L)) // by descending cosine: ~1, 0, -1
  }

  test("cosinePairs finds only pairs above threshold, ordered ida<idb") {
    val pairs = Similarity.cosinePairs(emb, 0.9)
      .select("ida", "idb").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((0L, 1L)))
  }

  test("ivfTopK equals brute force when every cell is probed") {
    // nCells = all vectors, nProbe = all cells -> exhaustive
    val ivf = Similarity.ivfTopK(emb, col("vec_id") === 0L, k = 3, nCells = 4, nProbe = 4)
      .select("rnk", "neighbor").as[(Long, Long)].collect().toSeq.sorted
    val e = Similarity.withNorm(emb)
    val queries = e.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val brute = Similarity.bruteForceTopK(
      e.select(col("vec_id").as("neighbor"), col("v").as("nv"), col("nrm").as("nnrm")),
      queries, 3)
      .select("rnk", "neighbor").as[(Long, Long)].collect().toSeq.sorted
    assert(ivf == brute)
  }

  test("KMeans-codebook IVF: exhaustive probe equals brute force; partial probe recalls") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pred = col("vec_id") % 10 === 0
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "neighbor").as[(Long, Long)].collect().toSet
    val e = Similarity.withNorm(fixture)
    val brute = pairs(Similarity.bruteForceTopK(
      e.select(col("vec_id").as("neighbor"), col("v").as("nv"), col("nrm").as("nnrm")),
      e.filter(pred).select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm")),
      5))
    // probing every cell is exhaustive search: must match exactly
    val allCells = pairs(Similarity.ivfTopKKMeans(fixture, pred, k = 5,
      nCells = 8, nProbe = 8))
    assert(allCells == brute)
    // partial probe: bounded work, useful recall (measured 0.36 @ 2/16)
    val partial = pairs(Similarity.ivfTopKKMeans(fixture, pred, k = 5,
      nCells = 16, nProbe = 2))
    val recall = (partial & brute).size.toDouble / brute.size
    assert(recall >= 0.25, s"recall@5 = $recall")
  }

  test("cosinePairsBlocked equals brute-force cosinePairs (lossless blocking)") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    for (t <- Seq(0.4, 0.7, 0.9)) {
      val brute = Similarity.cosinePairs(fixture, t).collect().map(_.toSeq).toSeq
      val blocked = Similarity.cosinePairsBlocked(fixture, t, nCells = 16)
        .collect().map(_.toSeq).toSeq
      assert(blocked == brute, s"threshold $t")
    }
  }

  test("semanticDecontaminate equals the brute-force bipartite pair set (lossless)") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pred = pmod(col("vec_id"), lit(10)) === 7
    for (t <- Seq(0.4, 0.7)) {
      // brute bipartite reference: all self-pairs filtered to opposite
      // sides (cosinePairs emits ida<idb, so check both orientations)
      val held = fixture.filter(pred).select(col("vec_id").as("h")).collect()
        .map(_.getLong(0)).toSet
      val brute = Similarity.cosinePairs(fixture, t).collect()
        .flatMap { r =>
          val (a, b, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
          if (held(a) && !held(b)) Some((b, a, s))
          else if (held(b) && !held(a)) Some((a, b, s))
          else None
        }.sortBy(p => (p._1, p._2)).toSeq
      val got = Similarity.semanticDecontaminate(fixture, pred, t, nCells = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == brute, s"threshold $t")
    }
  }

  test("semanticDedupSurvivorsFromIndex equals survivors over in-session pairs") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dir = s"/tmp/graft-test-sim/semdedup-${System.nanoTime()}"
    Similarity.writeIndex(fixture, dir, nCells = 16)
    val fromIndex = Similarity.semanticDedupSurvivorsFromIndex(
        spark, fixture, "vec_id", dir, threshold = 0.4)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq
    val pairs = Similarity.cosinePairsBlocked(fixture, 0.4, nCells = 16)
      .select(col("ida").as("da"), col("idb").as("db"))
    val inSession = graft.ops.Dedup.dedupSurvivors(fixture, "vec_id", pairs)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(fromIndex.nonEmpty && fromIndex == inSession)
    // the sweep actually dropped someone, and every cluster kept its min
    assert(fromIndex.size < fixture.count())
  }

  test("blocked pairs handle id spaces not starting at 0, and empty corpora") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .withColumn("vec_id", col("vec_id") + 100000L) // ids ≥ 100000
    val brute = Similarity.cosinePairs(fixture, 0.4).collect().map(_.toSeq).toSeq
    val blocked = Similarity.cosinePairsBlocked(fixture, 0.4, nCells = 16)
      .collect().map(_.toSeq).toSeq
    assert(blocked == brute && brute.nonEmpty)
    val empty = fixture.filter(col("vec_id") < 0)
    assert(Similarity.cosinePairsBlocked(empty, 0.4).count() == 0)
    assert(Similarity.ivfTopK(empty, col("vec_id") % 10 === 0, 5, 16, 2).count() == 0)
  }

  test("rewrite-at-same-path + cache clear stays lossless (radii follow the live assignment)") {
    // The staleness trap: data under a path is REWRITTEN, the user clears
    // the Spark cache (the documented persist remedy). The memoized
    // codebook is keyed on the reading plan — same path, same key — so it
    // stays stale; losslessness must survive that, because radii are
    // always recomputed from the live assignment, never memoized apart.
    val dir = s"/tmp/graft-test-sim/rewrite-${System.nanoTime()}"
    val src = spark.read.parquet(s"$sf0001/embeddings.parquet")
    src.filter(col("vec_id") < 250).write.mode("overwrite").parquet(dir)
    val read = () => spark.read.parquet(dir)
    val first = Similarity.cosinePairsBlocked(read(), 0.4, nCells = 8)
      .collect().map(_.toSeq).toSeq
    assert(first == Similarity.cosinePairs(read(), 0.4).collect().map(_.toSeq).toSeq)
    // rewrite with a DIFFERENT corpus slice at the same path
    src.filter(col("vec_id") >= 250).write.mode("overwrite").parquet(dir)
    spark.catalog.clearCache()
    val second = Similarity.cosinePairsBlocked(read(), 0.4, nCells = 8)
      .collect().map(_.toSeq).toSeq
    assert(second == Similarity.cosinePairs(read(), 0.4).collect().map(_.toSeq).toSeq,
      "blocked pairs after rewrite+clearCache must match brute force on the new data")
    // explicit invalidation also refreshes the codebook itself
    Similarity.clearIndexCaches()
    val third = Similarity.cosinePairsBlocked(read(), 0.4, nCells = 8)
      .collect().map(_.toSeq).toSeq
    assert(third == second)
  }

  test("cosinePairsBlockedKMeans (trained codebook) also equals brute force") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val brute = Similarity.cosinePairs(fixture, 0.4).collect().map(_.toSeq).toSeq
    val blocked = Similarity.cosinePairsBlockedKMeans(fixture, 0.4, nCells = 8)
      .collect().map(_.toSeq).toSeq
    assert(blocked == brute)
  }

  test("cosinePairsBlocked plans as equi-join: no nested loop, no cartesian") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val plan = Similarity.cosinePairsBlocked(fixture, 0.4, nCells = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(30).mkString("\n"))
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(30).mkString("\n"))
  }

  test("ivfTopK corpus assignment is shuffle-free (no Exchange below the cell join)") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // concrete (non-adaptive) plan so the join node is directly collectable
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try Similarity.ivfTopK(fixture, col("vec_id") % 10 === 0,
      k = 5, nCells = 16, nProbe = 2).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    // the corpus side of the BroadcastHashJoin must be scan+project only:
    // any Exchange under the join means assignment shuffled the corpus
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(joins.nonEmpty, "expected a broadcast cell join\n" + plan.toString)
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    val streamedSide =
      if (joins.head.buildSide == BuildRight) joins.head.left else joins.head.right
    assert(!streamedSide.toString.contains("Exchange"),
      "corpus side shuffled before cell join:\n" + streamedSide.toString)
    assert(!plan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("ivfRecallAtK: probing every cell recovers brute force exactly; partial probe is bounded + deterministic") {
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pred = col("vec_id") % 10 === 0
    // nProbe == nCells searches the whole corpus: identical result set
    // (and tie-breaks) as brute force => recall exactly 1.0 everywhere
    val full = Similarity.ivfRecallAtK(corpus, pred, k = 5, nCells = 8, nProbe = 8)
    assert(full.agg(min(col("recall"))).head.getDouble(0) == 1.0)
    // partial probing: one row per query, recall in [0,1], and the seeded
    // codebook makes the whole frame reproducible call-to-call
    val p1 = Similarity.ivfRecallAtK(corpus, pred, k = 5, nCells = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val nQueries = corpus.filter(pred).count()
    assert(p1.size == nQueries)
    assert(p1.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
    val p2 = Similarity.ivfRecallAtK(corpus, pred, k = 5, nCells = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(p1 == p2, "seeded recall query must be deterministic")
  }

  test("ivfRecallAtKLloyd: full probe equals brute force; deterministic; useful partial recall") {
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pred = col("vec_id") % 10 === 0
    // exhaustive probe searches every trained cell: recall exactly 1.0
    val full = Similarity.ivfRecallAtKLloyd(corpus, pred, k = 5,
      nCells = 8, nProbe = 8, rounds = 2)
    assert(full.agg(min(col("recall"))).head.getDouble(0) == 1.0)
    // fixed-point training is integer-exact => bit-identical call-to-call
    def partial() = Similarity.ivfRecallAtKLloyd(corpus, pred, k = 5,
      nCells = 8, nProbe = 2, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val p1 = partial()
    assert(p1.size == corpus.filter(pred).count())
    assert(p1.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
    assert(p1 == partial(), "fixed-point trained recall must be deterministic")
    // a trained codebook at 2/8 probes should beat a coin flip on this
    // clustered corpus — the recall floor the quality metric exists for
    val mean = p1.map(_._2).sum / p1.size
    assert(mean >= 0.25, s"mean recall@5 = $mean")
  }

  test("beamSearchRecallAtK: hops=0+beam=k degenerates to plain IVF recall; graph hops only improve; deterministic") {
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pred = col("vec_id") % 10 === 0
    def mean(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg(col("recall"))).head.getDouble(0)
    def byQ(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // zero hops with beam = k visits exactly the IVF top-k candidates:
    // the readout IS the plain sample-codebook recall, bit for bit
    val degenerate = Similarity.beamSearchRecallAtK(corpus, pred, k = 5,
      nCells = 8, nProbe = 2, m = 4, beam = 5, hops = 0)
    val plain = Similarity.ivfRecallAtKSample(corpus, pred, k = 5,
      nCells = 8, nProbe = 2)
    assert(byQ(degenerate) == byQ(plain))
    // a visited SUPERSET can only improve agreement with the true
    // top-k (a displacing node has higher exact sim, so it is itself a
    // true top-k member): recall climbs with beam/hops — the knob
    val refined = Similarity.beamSearchRecallAtK(corpus, pred, k = 5,
      nCells = 8, nProbe = 2, m = 4, beam = 8, hops = 2)
    assert(mean(refined) >= mean(plain))
    // deterministic call-to-call
    assert(byQ(refined) == byQ(Similarity.beamSearchRecallAtK(corpus, pred,
      k = 5, nCells = 8, nProbe = 2, m = 4, beam = 8, hops = 2)))
  }

  test("durable beam-graph index: served recall equals the in-session build bit-for-bit; graph side placed") {
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pred = col("vec_id") % 10 === 0
    val dir = s"/tmp/graft-test-sim/beam-${System.nanoTime()}"
    def byQ(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    try {
      Similarity.writeBeamGraphIndex(corpus, dir, "beam_graph_spec",
        nCells = 8, nProbe = 2, m = 4, buckets = 4)
      val served = Similarity.beamSearchRecallAtKFromIndex(spark, dir,
        "beam_graph_spec", pred, k = 5, nProbe = 2, beam = 8, hops = 2)
      val inSession = Similarity.beamSearchRecallAtK(corpus, pred, k = 5,
        nCells = 8, nProbe = 2, m = 4, beam = 8, hops = 2)
      assert(byQ(served) == byQ(inSession) && byQ(served).nonEmpty)
      // EXTERNAL query vectors (the ivfTopKFromIndexFor contract): raw
      // (vec_id, embedding) rows serve identically to index members
      val ext = Similarity.beamTopKFromIndexFor(spark, dir,
        "beam_graph_spec", corpus.filter(pred), k = 5, nProbe = 2,
        beam = 8, hops = 2)
      val extRows = ext.collect().map(_.toSeq).toSeq
      assert(extRows.nonEmpty &&
        extRows == ext.collect().map(_.toSeq).toSeq) // deterministic
      assert(ext.groupBy(col("qid")).count()
        .agg(max(col("count"))).head.getLong(0) <= 5L)
      // hop-join shape: the placed edge table never moves — only the
      // frontier side exchanges (the q105 PageRank-relation argument)
      val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val edges = spark.table("beam_graph_spec")
        val frontier = corpus.filter(pred).select(col("vec_id").as("node"))
        val j = frontier.join(edges, frontier("node") === edges("src"))
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true"),
          s"hop join must read the placed bucketed graph; plan was:\n$plan")
        assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
          s"only the frontier side may exchange; plan was:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    } finally spark.sql("DROP TABLE IF EXISTS beam_graph_spec")
  }

  test("appendToBeamGraphIndex: append ≡ rebuild with the same codebook — bit-identical edges and serve") {
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pred = col("vec_id") % 10 === 0
    // arrivals take the HIGHEST ids, so the base slice contains the 8
    // lowest — the rebuild then samples the SAME codebook as the base
    // build, making a plain writeBeamGraphIndex over the union the
    // exact same-codebook reference the append must reproduce
    val cut = corpus.agg(max(col("vec_id"))).head.getLong(0) * 4 / 5
    val base = corpus.filter(col("vec_id") <= cut)
    val arrivals = corpus.filter(col("vec_id") > cut)
    val dirA = s"/tmp/graft-test-sim/beamapp-${System.nanoTime()}"
    val dirB = s"/tmp/graft-test-sim/beamreb-${System.nanoTime()}"
    def byQ(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def edgeSet(tbl: String) = spark.table(tbl).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      Similarity.writeBeamGraphIndex(base, dirA, "beam_graph_app",
        nCells = 8, nProbe = 2, m = 4, buckets = 4)
      // an index without graph meta (pre-maintenance layout) must fail
      // loudly, not silently append with default parameters
      val noMeta = intercept[IllegalArgumentException] {
        Similarity.appendToBeamGraphIndex(arrivals,
          s"$dirA/definitely-missing", "beam_graph_app")
      }
      assert(noMeta.getMessage.contains("graph meta"))
      // TWO sequential appends (the steady-state shape): each must see
      // the prior append's exact state — the graph-table rewrite must
      // not lose the meta/codebook sidecars, and exactness composes
      val mid = (cut + corpus.agg(max(col("vec_id"))).head.getLong(0)) / 2
      Similarity.appendToBeamGraphIndex(
        arrivals.filter(col("vec_id") <= mid), dirA, "beam_graph_app")
      Similarity.appendToBeamGraphIndex(
        arrivals.filter(col("vec_id") > mid), dirA, "beam_graph_app")
      Similarity.writeBeamGraphIndex(corpus, dirB, "beam_graph_reb",
        nCells = 8, nProbe = 2, m = 4, buckets = 4)
      val ea = edgeSet("beam_graph_app")
      val eb = edgeSet("beam_graph_reb")
      assert(ea == eb && ea.nonEmpty,
        s"append drifted from rebuild: only-append=${(ea -- eb).take(5)} " +
          s"only-rebuild=${(eb -- ea).take(5)}")
      // and the serve path reads identically off both indexes
      val sa = Similarity.beamSearchRecallAtKFromIndex(spark, dirA,
        "beam_graph_app", pred, k = 5, nProbe = 2, beam = 8, hops = 2)
      val sb = Similarity.beamSearchRecallAtKFromIndex(spark, dirB,
        "beam_graph_reb", pred, k = 5, nProbe = 2, beam = 8, hops = 2)
      assert(byQ(sa) == byQ(sb) && byQ(sa).nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS beam_graph_app")
      spark.sql("DROP TABLE IF EXISTS beam_graph_reb")
    }
  }

  test("durable index round trip: served results equal the in-session paths") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dir = s"/tmp/graft-test-sim/index-${System.nanoTime()}"
    Similarity.writeIndex(fixture, dir, nCells = 16)
    val pred = col("vec_id") % 10 === 0
    val fromIndex = Similarity.ivfTopKFromIndex(spark, dir, pred, k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSeq
    val inSession = Similarity.ivfTopK(fixture, pred, k = 5, nCells = 16, nProbe = 2)
      .collect().map(_.toSeq).toSeq
    assert(fromIndex.nonEmpty && fromIndex == inSession)
    val pairsFromIndex = Similarity.cosinePairsBlockedFromIndex(spark, dir, 0.4)
      .collect().map(_.toSeq).toSeq
    val brute = Similarity.cosinePairs(fixture, 0.4).collect().map(_.toSeq).toSeq
    assert(pairsFromIndex.nonEmpty && pairsFromIndex == brute)
  }

  test("ivfHardNegativesFromIndex: band-filtered re-rank of the full " +
    "probed-cell candidate list; every row in-band") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dir = s"/tmp/graft-test-sim/hardneg-${System.nanoTime()}"
    Similarity.writeIndex(fixture, dir, nCells = 16)
    val pred = col("vec_id") % 10 === 0
    val (lo, hi) = (0.2, 0.4)
    val hard = Similarity.ivfHardNegativesFromIndex(spark, dir, pred,
      k = 5, nProbe = 2, lo = lo, hi = hi)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(hard.nonEmpty)
    assert(hard.forall(t => t._4 >= lo && t._4 < hi), "out-of-band row")
    // expected = the FULL candidate ranking (k = corpus size reaches
    // every probed-cell candidate), band-filtered, re-ranked, top 5.
    // (Band boundaries sit far from any rounded sim in this fixture, so
    // filtering the rounded output is equivalent; the DuckDB oracle
    // checks the unrounded contract.)
    val n = fixture.count().toInt
    val full = Similarity.ivfTopKFromIndex(spark, dir, pred, k = n, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    val expect = full.filter(t => t._3 >= lo && t._3 < hi)
      .groupBy(_._1).toSeq.flatMap { case (_, cs) =>
        cs.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
          .map { case ((q, nb, s), i) => (q, (i + 1).toLong, nb, s) }
      }.sorted
    assert(hard.sorted == expect)
  }

  test("cellAssignments: total (every nonzero-norm vector exactly once), " +
    "cells drawn from the sample codebook, deterministic") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val a = Similarity.cellAssignments(fixture, nCells = 16)
      .as[(Long, Long)].collect().toSeq
    val n = fixture.count()
    assert(a.size == n && a.map(_._1).distinct.size == n.toInt)
    // the codebook is the 16 lowest vec_ids, so cells are vector ids
    val cells = a.map(_._2).distinct.sorted
    val lowest16 = a.map(_._1).sorted.take(16).toSet
    assert(cells.forall(lowest16.contains), cells.toString)
    val b = Similarity.cellAssignments(fixture, nCells = 16)
      .as[(Long, Long)].collect().toSeq
    assert(a.sorted == b.sorted)
  }

  test("ivfPqRerank: r = corpus size degenerates bit-equal to exact IVF; " +
    "re-rank never hurts shortlist recall") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pred = col("vec_id") % 10 === 0
    val n = fixture.count().toInt
    // shortlist = every probed-cell candidate -> exact re-rank IS exact
    // IVF over the same probe set (same cells, same tie-breaks)
    val rr = Similarity.ivfPqRerank(fixture, pred, k = 5, r = n,
        nCells = 16, nProbe = 2, m = 8, ks = 16)
      .collect().map(_.toSeq).toSeq
    val exact = Similarity.ivfTopK(fixture, pred, k = 5, nCells = 16,
        nProbe = 2).collect().map(_.toSeq).toSeq
    assert(rr == exact && rr.nonEmpty)
    // at a working shortlist size the result is exact over the
    // shortlist: every returned neighbor must come from the ADC top-25
    val short = Similarity.ivfPqTopK(fixture, pred, k = 25, nCells = 16,
        nProbe = 2, m = 8, ks = 16)
      .select(col("qid"), col("neighbor")).as[(Long, Long)].collect().toSet
    val rr25 = Similarity.ivfPqRerank(fixture, pred, k = 5, r = 25,
      nCells = 16, nProbe = 2, m = 8, ks = 16)
    val pairs = rr25.select(col("qid"), col("neighbor"))
      .as[(Long, Long)].collect().toSeq
    assert(pairs.nonEmpty && pairs.forall(short.contains))
    // sims are exact cosines in descending order per query
    val byQ = rr25.select(col("qid"), col("rnk"), col("sim"))
      .as[(Long, Long, Double)].collect().groupBy(_._1)
    assert(byQ.values.forall { rows =>
      val sims = rows.sortBy(_._2).map(_._3).toSeq
      sims == sims.sorted.reverse
    })
  }

  test("index serving prunes the corpus scan to the probed cells") {
    // 3 orthogonal clusters -> 3 well-separated KMeans cells; a single
    // query probing 1 cell must push a literal partition filter so the
    // scan never opens the other cells' directories
    val rows = for (c <- 0 until 3; i <- 0 until 20) yield {
      val v = Array(0.0f, 0.0f, 0.0f)
      v(c) = 1.0f + i * 0.01f // same direction, varying magnitude
      ((c * 100 + i).toLong, v)
    }
    val emb3 = rows.toDF("vec_id", "embedding")
    val dir = s"/tmp/graft-test-sim/prune-${System.nanoTime()}"
    Similarity.writeIndexKMeans(emb3, dir, nCells = 3, seed = 7L)
    val served = Similarity.ivfTopKFromIndex(spark, dir, col("vec_id") === 0L,
      k = 3, nProbe = 1)
    // the corpus-side assignment scan must carry a partition filter over
    // `cell` restricted to the single probed cell
    val scans = served.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("assignment")) => f
    }
    val pruned = scans.filter(_.partitionFilters.exists(_.toString.contains("cell")))
    assert(pruned.nonEmpty,
      "no assignment scan carries a cell partition filter:\n" +
        served.queryExecution.sparkPlan.toString)
    // behavioral check: with orthogonal clusters and nProbe = 1, every
    // neighbor of query 0 comes from cluster 0 (ids < 100)
    val neighbors = served.select("neighbor").as[Long].collect().toSeq
    assert(neighbors.nonEmpty && neighbors.forall(_ < 100L), neighbors.toString)
  }

  test("appendToIndex: pairs served after an append equal a from-scratch search") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dir = s"/tmp/graft-test-sim/append-${System.nanoTime()}"
    // index built WITHOUT the appended slice: the codebook never saw it
    Similarity.writeIndex(fixture.filter(col("vec_id") % 7 =!= 0), dir, nCells = 16)
    Similarity.appendToIndex(fixture.filter(col("vec_id") % 7 === 0), dir)
    val served = Similarity.cosinePairsBlockedFromIndex(spark, dir, 0.4)
      .collect().map(_.toSeq).toSeq
    val brute = Similarity.cosinePairs(fixture, 0.4).collect().map(_.toSeq).toSeq
    assert(served.nonEmpty && served == brute,
      "append must preserve exactness (admissibility holds for any codebook)")
    // appending must not have rewritten the original cell files' content:
    // the union of assignment rows covers exactly the full corpus
    val n = spark.read.parquet(s"$dir/assignment").count()
    assert(n == Similarity.withNorm(fixture).filter(col("nrm") > 0).count())
  }

  test("durable IVF-PQ index: serve equals in-session, reads only (vec_id, codes), pruned") {
    Similarity.clearIndexCaches()
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dir = s"/tmp/graft-test-sim/pqindex-${System.nanoTime()}"
    Similarity.writePqIndex(fixture, dir, nCells = 16, m = 8, ks = 16)
    val pred = col("vec_id") % 10 === 0
    val served = Similarity.ivfPqTopKFromIndexFor(spark, dir,
      fixture.filter(pred), k = 5, nProbe = 2)
    val inSession = Similarity.ivfPqTopK(fixture, pred, k = 5, nCells = 16,
      nProbe = 2).collect().map(_.toSeq).toSeq
    val servedRows = served.collect().map(_.toSeq).toSeq
    assert(servedRows.nonEmpty && servedRows == inSession)
    // the 100-TB contract: the serve plan touches NO raw vectors — the
    // assignment scan reads only (vec_id, codes) with `cell` arriving as
    // a pruned partition column
    val scans = served.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("assignment")) => f
    }
    assert(scans.nonEmpty, served.queryExecution.sparkPlan.toString)
    scans.foreach { f =>
      assert(f.requiredSchema.fieldNames.toSet == Set("vec_id", "codes"),
        s"serve scan reads ${f.requiredSchema.fieldNames.mkString(",")}")
      assert(f.partitionFilters.exists(_.toString.contains("cell")),
        "serve scan carries no cell partition filter")
    }
  }

  test("writePqIndexKMeans: trained-codebook index serves the pqTopKKMeans answer") {
    Similarity.clearIndexCaches()
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dir = s"/tmp/graft-test-sim/pqkm-${System.nanoTime()}"
    Similarity.writePqIndexKMeans(fixture, dir, nCells = 16, m = 8, ks = 16,
      seed = 42L)
    val pred = col("vec_id") % 10 === 0
    // probing every cell makes the coarse stage a no-op, so the served
    // answer must equal the flat trained-codebook PQ exactly (same
    // kmeansPqCodebook seed -> same fine quantizer on both paths)
    val served = Similarity.ivfPqTopKFromIndexFor(spark, dir,
      fixture.filter(pred), k = 5, nProbe = 16).collect().map(_.toSeq).toSeq
    val flat = Similarity.pqTopKKMeans(fixture, pred, k = 5, m = 8, ks = 16,
      seed = 42L).collect().map(_.toSeq).toSeq
    assert(served.nonEmpty && served == flat)
    Similarity.clearIndexCaches()
  }

  test("appendToPqIndex: appended vectors served with the stored codebooks") {
    Similarity.clearIndexCaches()
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dir = s"/tmp/graft-test-sim/pqappend-${System.nanoTime()}"
    Similarity.writePqIndex(fixture.filter(col("vec_id") % 7 =!= 0), dir,
      nCells = 16, m = 8, ks = 16)
    Similarity.appendToPqIndex(fixture.filter(col("vec_id") % 7 === 0), dir)
    // coverage: the union of assignment rows is exactly the full corpus,
    // original cell files untouched by the append
    val n = spark.read.parquet(s"$dir/assignment").count()
    assert(n == Similarity.withNorm(fixture).filter(col("nrm") > 0).count())
    // the served answer over the combined index is complete (k rows per
    // query) and deterministic; appended vectors are reachable as
    // neighbors (codes were computed with the STORED codebooks)
    val served = Similarity.ivfPqTopKFromIndexFor(spark, dir,
      fixture.filter(col("vec_id") % 10 === 0), k = 5, nProbe = 16)
      .collect().map(_.toSeq).toSeq
    val perQ = served.groupBy(_.head).view.mapValues(_.size)
    assert(perQ.nonEmpty && perQ.values.forall(_ == 5))
    val again = Similarity.ivfPqTopKFromIndexFor(spark, dir,
      fixture.filter(col("vec_id") % 10 === 0), k = 5, nProbe = 16)
      .collect().map(_.toSeq).toSeq
    assert(served == again)
    assert(served.exists(r => r(2).asInstanceOf[Long] % 7 == 0),
      "no appended vector ever appears as a neighbor")
  }

  test("compactIndex: fewer files, identical served results (ANN and PQ layouts)") {
    Similarity.clearIndexCaches()
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def dataFiles(p: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).count(_.getName.endsWith(".parquet"))
    }
    // ANN layout
    val dir = s"/tmp/graft-test-sim/compact-${System.nanoTime()}"
    Similarity.writeIndex(fixture.filter(col("vec_id") % 3 === 0), dir, nCells = 16)
    Similarity.appendToIndex(fixture.filter(col("vec_id") % 3 === 1), dir)
    Similarity.appendToIndex(fixture.filter(col("vec_id") % 3 === 2), dir)
    val before = Similarity.cosinePairsBlockedFromIndex(spark, dir, 0.4)
      .collect().map(_.toSeq).toSeq
    val fb = dataFiles(s"$dir/assignment")
    Similarity.compactIndex(spark, dir)
    assert(dataFiles(s"$dir/assignment") < fb)
    val after = Similarity.cosinePairsBlockedFromIndex(spark, dir, 0.4)
      .collect().map(_.toSeq).toSeq
    assert(after.nonEmpty && after == before)
    // PQ layout: same entry point, same guarantee
    val pqDir = s"/tmp/graft-test-sim/compactpq-${System.nanoTime()}"
    Similarity.writePqIndex(fixture.filter(col("vec_id") % 3 =!= 2), pqDir,
      nCells = 16, m = 8, ks = 16)
    Similarity.appendToPqIndex(fixture.filter(col("vec_id") % 3 === 2), pqDir)
    val pqQ = fixture.filter(col("vec_id") % 10 === 0)
    val pqBefore = Similarity.ivfPqTopKFromIndexFor(spark, pqDir, pqQ, 5, 2)
      .collect().map(_.toSeq).toSeq
    val pfb = dataFiles(s"$pqDir/assignment")
    Similarity.compactIndex(spark, pqDir)
    assert(dataFiles(s"$pqDir/assignment") < pfb)
    val pqAfter = Similarity.ivfPqTopKFromIndexFor(spark, pqDir, pqQ, 5, 2)
      .collect().map(_.toSeq).toSeq
    assert(pqAfter.nonEmpty && pqAfter == pqBefore)
  }

  test("ivfTopKFromIndexFor serves external query vectors (member queries as the oracle)") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dir = s"/tmp/graft-test-sim/extq-${System.nanoTime()}"
    Similarity.writeIndex(fixture, dir, nCells = 16)
    val pred = col("vec_id") % 10 === 0
    // external frame carrying the same vectors: results must coincide with
    // the member-query serving path
    val external = fixture.filter(pred)
    val viaExternal = Similarity.ivfTopKFromIndexFor(spark, dir, external,
      k = 5, nProbe = 2).collect().map(_.toSeq).toSeq
    val viaMembers = Similarity.ivfTopKFromIndex(spark, dir, pred,
      k = 5, nProbe = 2).collect().map(_.toSeq).toSeq
    assert(viaExternal.nonEmpty && viaExternal == viaMembers)
  }

  test("ivfRecallAtKSample: exhaustive probe = 1.0; deterministic under partial probe") {
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pred = col("vec_id") % 10 === 0
    val full = Similarity.ivfRecallAtKSample(corpus, pred, k = 5, nCells = 8, nProbe = 8)
    assert(full.agg(min(col("recall"))).head.getDouble(0) == 1.0)
    val p1 = Similarity.ivfRecallAtKSample(corpus, pred, k = 5, nCells = 16, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(p1.size == corpus.filter(pred).count())
    assert(p1.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
  }

  test("repeated blocked-pairs calls serve radii/codebook from memos (zero jobs at plan build)") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    Similarity.cosinePairsBlocked(fixture, 0.4, nCells = 16).count() // fill memos
    Thread.sleep(300) // let async listener events from the fill drain
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      // plan CONSTRUCTION only — with radii + codebook memoized, building
      // the query must schedule no driver-side job at all
      Similarity.cosinePairsBlocked(fixture, 0.4, nCells = 16)
      Thread.sleep(500)
    } finally spark.sparkContext.removeSparkListener(l)
    assert(jobs == 0, s"$jobs jobs ran while building the repeated query")
  }

  test("autoCells derives ~sqrt(n) bounded to [16, 4096]") {
    val fixture = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val e = Similarity.withNorm(fixture).filter(col("nrm") > 0)
    val n = e.count()
    val k = Similarity.autoCells(e)
    assert(k == math.min(4096, math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)))
    // tiny corpus floors at 16
    assert(Similarity.autoCells(e.filter(col("vec_id") < 5)) == 16)
  }

  test("dot is an exact left fold (matches manual computation)") {
    val d = emb.select(
      Similarity.dot(
        transform(col("embedding"), x => x.cast("double")),
        transform(col("embedding"), x => x.cast("double"))).as("d"))
      .filter(col("d") > 1.0).count()
    // only vec 1 has |v|^2 > 1? (0.9^2 + 0.1^2 = 0.82) -> none besides exact 1.0s
    assert(d == 0)
  }

  test("srpNearDups equals a driver-side SRP replay and never exceeds brute force") {
    Similarity.clearIndexCaches()
    val real = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val threshold = 0.4
    val nBits = 16
    val bandBits = 4
    val got = Similarity.srpNearDups(real, threshold, nBits, bandBits)
      .as[(Long, Long, Double)].collect().toSeq

    // driver-side replay: first-nBits hyperplanes, sign bits, banding,
    // exact cosine verify — double arithmetic in the same fold order
    val vecs = real.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id, v.toArray) }
      .filter { case (_, v) => math.sqrt(v.map(x => x * x).sum) > 0 }
      .sortBy(_._1)
    val planes = vecs.take(nBits).map(_._2)
    def sig(v: Array[Double]): Seq[Long] =
      (0 until nBits / bandBits).map { b =>
        (0 until bandBits).map { j =>
          val h = planes(b * bandBits + j)
          if (v.zip(h).map { case (a, x) => a * x }.sum > 0) 1L << j else 0L
        }.sum
      }
    val sigs = vecs.map { case (id, v) => (id, v, sig(v)) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expect = (for {
      (ia, va, sa) <- sigs
      (ib, vb, sb) <- sigs
      if ia < ib && sa.zip(sb).exists { case (x, y) => x == y }
      c = cos(va, vb) if c >= threshold
    } yield (ia, ib)).toSet
    assert(got.map(p => (p._1, p._2)).toSet == expect)
    assert(got.nonEmpty, "expected SRP pairs on the test corpus")

    // approximate ⊆ exact: every reported pair is a true >= threshold
    // pair with the exact brute-force sim (same rounding)
    val brute = Similarity.cosinePairs(real, threshold)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    got.foreach { case (ia, ib, s) =>
      assert(brute.get((ia, ib)).contains(s), s"pair ($ia,$ib) not in brute force")
    }
  }

  test("pqTopK: ADC distances equal a driver-side PQ replay; recall sane") {
    Similarity.clearIndexCaches()
    val real = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val m = 8
    val ks = 16
    val k = 5
    val got = Similarity.pqTopK(real, col("vec_id") % 10 === 0, k, m, ks)
      .as[(Long, Long, Long, Double)].collect().toSeq

    // driver-side replay: normalize, sample codebook, argmin encode, ADC
    val vecs = real.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id, v.toArray) }
      .map { case (id, v) => (id, v, math.sqrt(v.map(x => x * x).sum)) }
      .filter(_._3 > 0)
      .map { case (id, v, n) => (id, v.map(_ / n)) }
      .sortBy(_._1)
    val d = vecs.head._2.length
    val dsub = d / m
    val cb = (0 until m).map(j =>
      vecs.take(ks).map(_._2.slice(j * dsub, (j + 1) * dsub)))
    def dists(v: Array[Double], j: Int): Seq[Double] =
      cb(j).map(c => v.slice(j * dsub, (j + 1) * dsub).zip(c)
        .map { case (a, b) => (a - b) * (a - b) }.sum).toSeq
    val codes = vecs.map { case (id, v) =>
      id -> (0 until m).map(j => { val ds = dists(v, j); ds.indexOf(ds.min) })
    }.toMap
    val expect = (for {
      (qid, qv) <- vecs if qid % 10 == 0
      tabs = (0 until m).map(j => dists(qv, j))
      scored = vecs.filter(_._1 != qid).map { case (nid, _) =>
        (nid, (0 until m).map(j => tabs(j)(codes(nid)(j))).sum)
      }
      ((nid, adist), i) <- scored.sortBy { case (nid, s) => (s, nid) }.take(k).zipWithIndex
    } yield (qid, (i + 1).toLong, nid,
      // valueOf = shortest-repr decimal, matching Spark's Round semantics
      BigDecimal.valueOf(adist).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)).toSeq
    assert(got.sortBy(r => (r._1, r._2)) == expect.sortBy(r => (r._1, r._2)))

    // recall vs exact cosine top-k: quantization loses information, but
    // with 16 sub-centroids per 8-dim subspace the ADC ranking must stay
    // far from random (random recall@5 over 499 candidates ≈ 0.01)
    val brute = Similarity.bruteForceTopK(
      Similarity.withNorm(real).filter(col("nrm") > 0)
        .select(col("vec_id").as("neighbor"), col("v").as("nv"), col("nrm").as("nnrm")),
      Similarity.withNorm(real).filter(col("nrm") > 0)
        .filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm")),
      k)
      .select(col("qid"), col("neighbor")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val gotByQ = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recall = gotByQ.map { case (q, ns) =>
      ns.intersect(brute(q)).size.toDouble / k
    }.sum / gotByQ.size
    // the fixed-sample codebook on this near-uniform corpus measures
    // ~0.13 — an order of magnitude above random (k/n ≈ 0.01), which is
    // what the floor guards; codebook QUALITY is the trained variant's job
    assert(recall > 0.05, f"PQ recall@5 $recall%.2f at random-guess level")

    // trained per-subspace codebooks must beat the fixed sample clearly
    val km = Similarity.pqTopKKMeans(real, col("vec_id") % 10 === 0, k, m, ks)
      .select(col("qid"), col("neighbor")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val kmRecall = km.map { case (q, ns) =>
      ns.intersect(brute(q)).size.toDouble / k
    }.sum / km.size
    assert(kmRecall > recall,
      f"trained PQ codebook recall $kmRecall%.2f not above sample $recall%.2f")
    assert(kmRecall > 0.15, f"trained PQ recall@5 $kmRecall%.2f too low")
    Similarity.clearIndexCaches()
  }

  test("fused PQ expressions are bit-identical to the HOF reference forms") {
    Similarity.clearIndexCaches()
    val real = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val e = Similarity.withNorm(real).filter(col("nrm") > 0)
    val cb = Similarity.collectPqCodebook(e, 8, 16)
    val vhat = transform(col("v"), x => x / col("nrm"))
    val hof = e.select(col("vec_id"),
        Similarity.pqCodesHof(vhat, cb).as("codes"),
        array(Similarity.pqDistArraysHof(vhat, cb): _*).as("tabs"))
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val fused = e.select(col("vec_id"),
        Similarity.pqCodes(col("v"), col("nrm"), cb).as("codes"),
        Similarity.pqTabs(col("v"), col("nrm"), cb).as("tabs"))
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(fused == hof)
    Similarity.clearIndexCaches()
  }

  test("ivfPqTopK: probing every cell equals flat PQ; partial probe sane") {
    Similarity.clearIndexCaches()
    val real = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pred = col("vec_id") % 10 === 0
    val flat = Similarity.pqTopK(real, pred, 5).collect().map(_.toSeq).toSeq
    // nProbe = nCells -> candidate set is the whole corpus -> the cell
    // stage must be a pure no-op on the result
    val full = Similarity.ivfPqTopK(real, pred, 5, nCells = 16, nProbe = 16)
      .collect().map(_.toSeq).toSeq
    assert(full == flat)
    // partial probe: still k rows per query, deterministic across runs
    val part = Similarity.ivfPqTopK(real, pred, 5, nCells = 16, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val perQ = part.groupBy(_._1).view.mapValues(_.size)
    assert(perQ.values.forall(_ == 5), "partial probe lost rows")
    val again = Similarity.ivfPqTopK(real, pred, 5, nCells = 16, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(part == again)
    Similarity.clearIndexCaches()
  }

  test("srpNearDups: corpus smaller than nBits yields no pairs") {
    Similarity.clearIndexCaches()
    val tiny = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 8)
    assert(Similarity.srpNearDups(tiny, 0.4, nBits = 16).isEmpty)
    Similarity.clearIndexCaches()
  }
}
