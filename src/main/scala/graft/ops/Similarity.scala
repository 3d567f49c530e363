package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * All arithmetic is double precision with strict left-to-right folds so
  * the DuckDB oracle (list_reduce, also a left fold) reproduces results
  * bit-for-bit.
  *
  * Scale path: `bruteForceTopK` broadcasts the (small) query set and scans
  * the corpus once — linear, shuffle-free except the final per-query top-k.
  * `ivfTopK` adds an inverted-file coarse quantizer: vectors are bucketed
  * by nearest centroid at index time; queries probe only `nProbe` buckets,
  * cutting the scan by ~|buckets|/nProbe at 100 TB. The codebook is tiny
  * (nCells × dim doubles), so it is collected once and baked into the plan
  * as a literal array: cell assignment is a per-row argmax *projection* —
  * no crossJoin row expansion, no shuffle, the whole assignment stays in
  * the scan stage.
  *
  * `cosinePairsBlocked` turns the all-pairs near-dup search into an exact
  * cell-blocked join: the same IVF assignment plus a triangle-inequality
  * admissibility matrix over cell pairs (computed from measured cell radii)
  * bounds which cell pairs can possibly hold a qualifying pair, so
  * candidate generation is an equi-join on the partner cell — never a
  * nested-loop — while the output provably equals the brute-force answer.
  */
object Similarity {

  /** Driver-side codebook entry (nCells × dim doubles — always tiny). */
  final case class Centroid(cid: Long, cv: Array[Double], cnrm: Double)

  /** vec_id + v (double array) + nrm (L2 norm, left-fold). */
  def withNorm(embeddings: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    graft.functions.CatalystExpressions.register(embeddings.sparkSession)
    embeddings
      .select(col(idCol), transform(col(embCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  /** Codegen'd left-fold dot product (CatalystExpressions.DotProduct); the
    * fold order matches both the HOF formulation and DuckDB's list_reduce,
    * so results are bit-identical to the oracles. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def cosine(a: Column, an: Column, b: Column, bn: Column): Column =
    dot(a, b) / (an * bn)

  /** Exact top-k neighbors for each query vector (brute force, the
    * correctness baseline). Queries are broadcast; ties broken by id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("neighbor"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("neighbor") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("qnrm"), col("nv"), col("nnrm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** All pairs (ida < idb) with cosine >= threshold, via explicit all-pairs
    * comparison. Quadratic by construction — kept only as the tiny-N
    * reference implementation and spec oracle for [[cosinePairsBlocked]],
    * which computes the identical answer with a linear-shuffle plan.
    *
    * Zero-norm vectors are dropped (here AND in the blocked variants):
    * cosine against them is 0/0 = NaN, and NaN's sort-greatest semantics
    * would otherwise make the brute path keep NaN pairs while the blocked
    * path's NaN radius drops their cells — the two paths stay exactly
    * equal only when neither ever sees a degenerate vector. */
  def cosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    val a = e.select(col("vec_id").as("ida"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("idb"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("ida") < col("idb"))
      .withColumn("sim", cosine(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("ida"), col("idb"), round(col("sim"), 6).as("sim"))
      .orderBy("ida", "idb")
  }

  /** Exact embedding near-dup pairs with a blocked (never nested-loop)
    * plan. Steps:
    *
    *  1. assign every vector to its nearest of `nCells` centroids — a
    *     per-row argmax projection over the broadcast codebook (no
    *     expansion, no shuffle);
    *  2. measure each cell's angular radius r(c) = max angle(member, c)
    *     (one tiny groupBy over ≤ nCells keys);
    *  3. on the driver, mark cell pair (ca, cb) admissible iff
    *     angle(ca, cb) − r(ca) − r(cb) ≤ θ_t (θ_t = arccos(threshold)):
    *     by the spherical triangle inequality, any pair (a, b) with
    *     angle(a, b) ≤ θ_t satisfies
    *     angle(ca, cb) ≤ r(ca) + angle(a, b) + r(cb), so every qualifying
    *     pair lives inside an admissible cell pair — the blocking is
    *     LOSSLESS and the output equals [[cosinePairs]] exactly;
    *  4. candidate generation = equi-join on the partner cell over the
    *     (tiny, broadcast) admissibility table; exact-cosine verify.
    *
    * The admissibility table contains both orderings of each pair plus the
    * diagonal; the `ida < idb` predicate then emits every unordered pair
    * exactly once, so no distinct pass is needed. Worst case (one dense
    * blob) degrades to all admissible pairs — still an equi-join, and data
    * with any cluster structure prunes most of the nCells² combinations.
    *
    * Cost note: the cell assignment is computed ONCE and materialized
    * (lazy persist, one cache slot — [[Materialize]]) — the radii job
    * fills the cache and both join sides read it instead of re-deriving
    * the argmax projection per subtree (the three subtrees differ, so
    * exchange reuse could never fuse them). At index scale the
    * assignment IS the IVF index-build step; [[writeIndex]] is the
    * durable variant — same plan shape, with the assignment persisted to
    * the lake partitioned by cell and served back partition-pruned by
    * [[cosinePairsBlockedFromIndex]]. */
  def cosinePairsBlocked(emb: DataFrame, threshold: Double,
      nCells: Int = 0): DataFrame = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    cosinePairsWithCells(e, collectCentroids(e, resolveCells(e, nCells)), threshold)
  }

  /** A/B hook (tools): [[cosinePairsBlocked]] with an explicit
    * materialization mode for the assignment frame. */
  private[graft] def cosinePairsBlockedMode(emb: DataFrame, threshold: Double,
      nCells: Int, mode: String): DataFrame = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    cosinePairsWithCells(e, collectCentroids(e, nCells), threshold, mode)
  }

  /** [[cosinePairsBlocked]] with a seeded MLlib KMeans codebook — the
    * production variant: trained cells align with the data's cluster
    * structure, so the admissibility matrix prunes far more cell pairs
    * than any fixed-sample codebook (near-dups live inside clusters).
    * Same lossless guarantee — the admissibility bound holds for ANY
    * codebook; training only improves pruning, never correctness. */
  def cosinePairsBlockedKMeans(emb: DataFrame, threshold: Double,
      nCells: Int = 0, seed: Long = 42L): DataFrame = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    cosinePairsWithCells(e, kmeansCentroids(e, resolveCells(e, nCells), seed), threshold)
  }

  private def cosinePairsWithCells(e: DataFrame, cents: Seq[Centroid],
      threshold: Double, mode: String = "persist"): DataFrame = {
    val spark = e.sparkSession
    if (cents.isEmpty) // empty corpus ⇒ no pairs (and no codebook to block on)
      return e.limit(0).select(col("vec_id").as("ida"), col("vec_id").as("idb"),
        col("nrm").as("sim"))
    // materialize the assignment ONCE: the radii collect fills the cache
    // and both join sides read it instead of recomputing the argmax
    // projection per subtree. Lazy persist (not an eager checkpoint) so
    // no extra job is scheduled — the radii action is the fill. The
    // assignment IS the IVF index: repeated searches over the same
    // corpus reuse the cached frame (plan-keyed), and a cluster run
    // would write it to the lake instead.
    val assignedRaw = assignCells(e, cents)
      .withColumn("cang", acos(least(greatest(col("best_sim"), lit(-1.0)), lit(1.0))))
    val assigned = mode match {
      case "checkpoint" => assignedRaw.localCheckpoint()
      case "persist"    => Materialize.cachedSingleton("similarity-assign", assignedRaw)
      case _            => assignedRaw
    }
    pairsOverAssigned(assigned, cents, threshold, memoRadii = mode == "persist")
  }

  /** Blocked-pairs join over an existing assignment frame
    * (vec_id, v, nrm, cell, cang) — shared by the in-session cached path
    * and the durable-index path ([[cosinePairsBlockedFromIndex]]). */
  /** Admissible cell pairs under the triangle-inequality bound: a pair
    * within angular threshold θ_T can only span cells (A, B) with
    * angle(c_A, c_B) ≤ r_A + θ_T + r_B (walk query→centroid,
    * query→candidate, candidate→centroid). ε absorbs acos rounding near
    * ±1; it can only ADD candidate cell pairs, never lose a qualifying
    * pair. Side-agnostic, so the same matrix serves the self-pair search
    * and the bipartite decontamination join as long as the radii cover
    * every vector either side reads. */
  private def admissibleCellPairs(cents: Seq[Centroid],
      radii: Map[Long, Double], thetaT: Double): Seq[(Long, Long)] = {
    def angle(a: Centroid, b: Centroid): Double = {
      var d = 0.0
      var i = 0
      while (i < math.min(a.cv.length, b.cv.length)) { d += a.cv(i) * b.cv(i); i += 1 }
      math.acos(math.max(-1.0, math.min(1.0, d / (a.cnrm * b.cnrm))))
    }
    val eps = 1e-6
    for {
      a <- cents
      b <- cents
      ra <- radii.get(a.cid).toSeq
      rb <- radii.get(b.cid).toSeq
      if angle(a, b) - ra - rb <= thetaT + eps
    } yield (a.cid, b.cid)
  }

  /** Semantic decontamination — the embedding-space member of the
    * decontamination family (exact 5-gram q50, fuzzy-lexical MinHash
    * q136): flag every TRAIN vector whose cosine similarity to ANY
    * held-out/benchmark vector reaches `threshold` — the paraphrase /
    * translation / re-render leakage that no lexical overlap can see
    * (the SemDeDup/D4 argument applied across the train/eval boundary).
    *
    * Shape: ONE shared assignment pass over the whole corpus (both
    * sides use the same codebook — cached, the q23 singleton), then a
    * BIPARTITE equi-join: held-out rows × admissible cell pairs
    * (broadcast ≤|cells|² frame) against train rows on cell id — the
    * train×train block, the overwhelming bulk at 100 TB (train ≫
    * held-out), is never generated, which is what distinguishes this
    * from filtering [[cosinePairsBlocked]]'s output. Lossless by the
    * same triangle-inequality bound (radii cover both sides because
    * they are measured over the undivided assignment). AQE broadcasts
    * the held-out side when it is small — the usual case.
    * Output: (train_id, heldout_id, sim) — every leaking train doc with
    * each benchmark doc it leaks, ready for a left-anti join. */
  def semanticDecontaminate(emb: DataFrame, heldoutPred: Column,
      threshold: Double, nCells: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    val e = withNorm(emb).filter(col("nrm") > 0)
    val cents = collectCentroids(e, resolveCells(e, nCells))
    if (cents.isEmpty)
      return e.limit(0).select(col("vec_id").as("train_id"),
        col("vec_id").as("heldout_id"), col("nrm").as("sim"))
    val assignedRaw = assignCells(e, cents)
      .withColumn("cang",
        acos(least(greatest(col("best_sim"), lit(-1.0)), lit(1.0))))
      .withColumn("__held", heldoutPred)
    val assigned = Materialize.cachedSingleton("semdecon-assign", assignedRaw)
    val radii = collectRadii(assigned, memo = true)
    val thetaT = math.acos(math.max(-1.0, math.min(1.0, threshold)))
    import spark.implicits._
    val adm = broadcast(
      admissibleCellPairs(cents, radii, thetaT).toDF("ca", "cb"))
    val held = assigned.filter(col("__held"))
      .select(col("vec_id").as("heldout_id"), col("v").as("va"),
        col("nrm").as("na"), col("cell"))
      .join(adm, col("cell") === col("ca"))
    val train = assigned.filter(!col("__held"))
      .select(col("vec_id").as("train_id"), col("v").as("vb"),
        col("nrm").as("nb"), col("cell").as("cellb"))
    held.join(train, col("cb") === col("cellb"))
      .withColumn("sim", cosine(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("train_id"), col("heldout_id"),
        round(col("sim"), 6).as("sim"))
      .orderBy("train_id", "heldout_id")
  }

  private def pairsOverAssigned(assigned: DataFrame, cents: Seq[Centroid],
      threshold: Double, memoRadii: Boolean): DataFrame = {
    val spark = assigned.sparkSession
    // Per-cell radii must describe the SAME data incarnation as the
    // assignment the join reads — that agreement is what the lossless-
    // blocking proof needs. The in-session path memoizes them keyed on
    // (canonicalized plan, Materialize generation): the generation bumps
    // on clearIndexCaches AND on any observed external clearCache, so a
    // rewrite-then-clear sequence recomputes radii alongside the
    // re-materialized assignment and the memo can never serve stale
    // radii. The lake path recomputes per call (memoRadii = false) —
    // index files can be overwritten with no in-session signal, and the
    // recompute is one column-pruned groupBy over ≤ nCells keys.
    // (A stale memoized CODEBOOK is harmless by contrast: the
    // admissibility bound holds for ANY codebook as long as radii are
    // measured against the same centroids the assignment used — staleness
    // there only costs pruning quality, never pairs.)
    val radii = collectRadii(assigned, memoRadii)
    val thetaT = math.acos(math.max(-1.0, math.min(1.0, threshold)))
    val admissible = admissibleCellPairs(cents, radii, thetaT)
    // cells in no admissible pair can contribute nothing: drop them with a
    // driver-side literal IN filter. Over the lake index this is a static
    // partition filter — the scan never opens the excluded cell dirs.
    // (For the FULL pair search every populated cell is admissible via its
    // diagonal, so this prunes only empty/degenerate cells; the filter
    // documents the serving shape, and [[ivfProbeJoin]]'s probed-cell
    // prune is where real partition skipping happens.)
    val liveCells = admissible.flatMap(p => Seq(p._1, p._2)).distinct
    val live = assigned.filter(col("cell").isin(liveCells: _*))
    import spark.implicits._
    val adm = broadcast(admissible.toDF("ca", "cb"))
    val left = live
      .select(col("vec_id").as("ida"), col("v").as("va"), col("nrm").as("na"), col("cell"))
      .join(adm, col("cell") === col("ca"))
    val right = live
      .select(col("vec_id").as("idb"), col("v").as("vb"), col("nrm").as("nb"),
        col("cell").as("cellb"))
    left.join(right, col("cb") === col("cellb") && col("ida") < col("idb"))
      .withColumn("sim", cosine(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("ida"), col("idb"), round(col("sim"), 6).as("sim"))
      .orderBy("ida", "idb")
  }

  /** IVF-style approximate top-k: assign every vector to its nearest
    * centroid (coarse quantizer), probe the `nProbe` closest centroids per
    * query, brute-force only inside the probed cells.
    *
    * The coarse quantizer here takes the first `nCells` corpus vectors as
    * centroids — a deterministic stand-in for a k-means codebook (declared
    * queries need oracle-replayable centroids). [[ivfTopKKMeans]] is the
    * trained-codebook variant; both share [[ivfTopKWith]]. */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int, nCells: Int = 0,
      nProbe: Int = 2, probeBroadcast: Boolean = true): DataFrame = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    ivfTopKWith(e, collectCentroids(e, resolveCells(e, nCells)), queryPred, k,
      nProbe, probeBroadcast)
  }

  /** IVF with an MLlib KMeans codebook (seeded, so runs are reproducible):
    * the production quantizer — centroids adapt to the data distribution,
    * so cells are balanced and recall at a given nProbe is higher than any
    * fixed-sample codebook. Training is one MLlib job over the corpus; the
    * centroids come back driver-side, exactly where [[ivfTopKWith]] wants
    * them. */
  def ivfTopKKMeans(emb: DataFrame, queryPred: Column, k: Int, nCells: Int = 0,
      nProbe: Int = 2, seed: Long = 42L, probeBroadcast: Boolean = true): DataFrame = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    ivfTopKWith(e, kmeansCentroids(e, resolveCells(e, nCells), seed), queryPred,
      k, nProbe, probeBroadcast)
  }

  private val kmeansCache = new PlanMemo[(Int, Long), Seq[Centroid]]

  /** Seeded MLlib KMeans codebook over the normalized frame; one MLlib
    * job, centroids come back driver-side where the plan literal wants
    * them. The norm fold matches [[dot]]'s left-to-right order.
    * Memoized on (corpus plan, nCells, seed) — training is the index
    * build, not a per-search cost. */
  private def kmeansCentroids(e: DataFrame, nCells: Int, seed: Long): Seq[Centroid] =
    kmeansCache.getOrElseUpdate(e, (nCells, seed))(
      kmeansCentroidsUncached(e, nCells, seed))

  private def kmeansCentroidsUncached(e: DataFrame, nCells: Int, seed: Long): Seq[Centroid] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = e.select(col("vec_id"), array_to_vector(col("v")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).fit(feat)
    model.clusterCenters.zipWithIndex.toSeq.map { case (c, i) =>
      val arr = c.toArray
      var acc = 0.0
      var j = 0
      while (j < arr.length) { acc += arr(j) * arr(j); j += 1 }
      Centroid(i.toLong, arr, math.sqrt(acc))
    }
  }

  /** Recall@k of the trained-codebook IVF path against the exact
    * brute-force neighbors — the quality metric every ANN deployment
    * tracks next to its latency. One row per query: hits/k. Fully
    * deterministic for a fixed corpus (seeded KMeans, deterministic
    * tie-breaks on both paths), but the MLlib codebook is not
    * SQL-replayable, so this variant is spec-covered only (recall floor
    * + full-probe==1.0 in SimilaritySpec); the declared query q54 runs
    * [[ivfRecallAtKLloyd]], whose training has a DuckDB twin. */
  def ivfRecallAtK(emb: DataFrame, queryPred: Column, k: Int, nCells: Int = 0,
      nProbe: Int = 2, seed: Long = 42L): DataFrame = {
    // zero-norm vectors produce NaN cosines, and NaN sorts greatest —
    // degenerate neighbors would take rank 1 in BOTH paths, corrupting
    // the recall ground truth. Drop them as the pairs paths do.
    val e = withNorm(emb).filter(col("nrm") > 0)
    recallAgainstBruteForce(e,
      ivfTopKWith(e, kmeansCentroids(e, resolveCells(e, nCells), seed),
        queryPred, k, nProbe),
      queryPred, k)
  }

  /** Recall@k of the *trained*-codebook IVF path where the coarse
    * quantizer is graft's exact fixed-point Lloyd's k-means
    * (Clustering.lloydCentroidInts: integer arithmetic, deterministic
    * ties, truncating centroid division) — unlike [[ivfRecallAtK]]'s
    * MLlib codebook, the training itself is SQL-replayable, so the
    * declared query (q54) is hash-checked end to end (VERDICT r15 #2).
    * Training runs over the RAW quantized corpus (the q198 frame);
    * serving converts the integer centroids back to double space
    * (c/1e6 — exact in IEEE double on both engines) and assigns by
    * cosine over the norm-filtered frame like every IVF path. */
  def ivfRecallAtKLloyd(emb: DataFrame, queryPred: Column, k: Int,
      nCells: Int, nProbe: Int = 2, rounds: Int = 3): DataFrame = {
    val xs = graft.ops.Clustering.quantized(emb).persist()
    val ints = graft.ops.Clustering.lloydCentroidInts(xs, nCells, rounds)
    xs.unpersist()
    ivfRecallAtKFromCentroidInts(emb, ints, queryPred, k, nProbe)
  }

  /** The serve half of [[ivfRecallAtKLloyd]] over an ALREADY-TRAINED
    * integer centroid table (r19 — VERDICT r18 #5): callers that cache
    * the Lloyd fixed point as first-touch ingest state
    * ([[graft.ops.Clustering.writeCentroidInts]] under a source
    * fingerprint) serve the identical recall rows without re-running the
    * training rounds' collect barriers on every call. */
  def ivfRecallAtKFromCentroidInts(emb: DataFrame, ints: Array[Array[Long]],
      queryPred: Column, k: Int, nProbe: Int = 2): DataFrame = {
    val cents = ints.zipWithIndex.map { case (c, i) =>
      val arr = c.map(_.toDouble / 1e6)
      var acc = 0.0
      var j = 0
      while (j < arr.length) { acc += arr(j) * arr(j); j += 1 }
      Centroid(i.toLong, arr, math.sqrt(acc))
    }.toSeq
    val e = withNorm(emb).filter(col("nrm") > 0)
    recallAgainstBruteForce(e, ivfTopKWith(e, cents, queryPred, k, nProbe),
      queryPred, k)
  }

  /** BEAM-SEARCH ANN with a recall readout — the graph-refined serving
    * path (the HNSW idea in its one-layer, SET-ORIENTED form: a
    * navigable neighbor graph lets the search escape the IVF probe's
    * cell boundary, and the beam width is the recall/latency knob ANN
    * serving actually ships with — VERDICT r15 #7c):
    *
    *  1. BUILD (once): a top-`m` neighbor graph — every vector's m
    *     nearest among its `nProbe` probed cells (the bulk-kNN shape of
    *     [[ivfTopKWith]], probe side NOT broadcast: the query set IS
    *     the corpus).
    *  2. ENTER: each query's IVF top-`beam` candidates (the plain probe
    *     join) form frontier b₀.
    *  3. REFINE (`hops` times): expand the ENTIRE query set's frontier
    *     through the edge table in ONE equi-join, union the previous
    *     frontier, rescore, keep the best `beam` per query (sim DESC,
    *     node ASC) — relational beam search, all queries advance
    *     simultaneously, no per-query loop. Since each candidate set
    *     contains its predecessor frontier, the per-query best-so-far
    *     is monotone.
    *  4. READ OUT: top-`k` over everything VISITED (∪ of all
    *     frontiers), as recall against exact brute force — the
    *     q54/q55 contract, so raising `beam`/`hops` shows recall
    *     climbing toward 1.0 while touched-vector counts stay bounded
    *     by beam·(m+1)·|queries| per hop.
    *
    * Fully deterministic and SQL-replayable end to end (membership
    * decided on unrounded doubles both engines; every window ordered
    * (sim DESC, id ASC)) — q206 hash-checks build, entry, every hop,
    * and the recall epilogue.
    *
    * Scale shape: the graph build is the one corpus-quadratic-bounded
    * stage (probed-cell join, the q29 argument) and is a durable-index
    * candidate like every build; each hop moves only |queries|·beam
    * frontier rows against the edge table (equi-join on node — at
    * 100 TB the edge table is bucketed by src exactly like the q105
    * PageRank relation and never moves). */
  def beamSearchRecallAtK(emb: DataFrame, queryPred: Column, k: Int,
      nCells: Int, nProbe: Int = 2, m: Int = 6, beam: Int = 8,
      hops: Int = 2): DataFrame = {
    require(k >= 1 && beam >= k, s"need beam >= k >= 1, got beam=$beam k=$k")
    require(m >= 1 && hops >= 0, s"need m >= 1, hops >= 0")
    val e = withNorm(emb).filter(col("nrm") > 0)
    val cents = collectCentroids(e, resolveCells(e, nCells))
    val edges = Materialize.cachedSingleton("beam-edges",
      ivfTopKWith(e, cents, lit(true), m, nProbe, probeBroadcast = false)
        .select(col("qid").as("src"), col("neighbor").as("dst")))
    val qs = e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val nodes = e.select(col("vec_id").as("node"), col("v").as("nv"),
      col("nrm").as("nnrm"))
    val wBeam = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("node"))
    var frontier = ivfTopKWith(e, cents, queryPred, beam, nProbe,
      probeBroadcast = true)
      .select(col("qid"), col("neighbor").as("node"))
    val frontiers = Seq.newBuilder[DataFrame]
    frontiers += frontier
    for (_ <- 1 to hops) {
      val cand = frontier
        .unionAll(frontier.join(edges, frontier("node") === edges("src"))
          .select(col("qid"), col("dst").as("node")))
        .filter(col("node") =!= col("qid"))
        .dropDuplicates("qid", "node")
      frontier = cand
        .join(qs, "qid").join(nodes, "node")
        .withColumn("sim", cosine(col("qv"), col("qnrm"), col("nv"), col("nnrm")))
        .withColumn("__rk", row_number().over(wBeam))
        .filter(col("__rk") <= beam)
        .select(col("qid"), col("node"))
      frontiers += frontier
    }
    val visited = frontiers.result().reduce(_.unionAll(_))
      .dropDuplicates("qid", "node")
    val topk = visited
      .join(qs, "qid").join(nodes, "node")
      .withColumn("sim", cosine(col("qv"), col("qnrm"), col("nv"), col("nnrm")))
      .withColumn("__rk", row_number().over(wBeam))
      .filter(col("__rk") <= k)
      .select(col("qid"), col("node").as("neighbor"))
    recallAgainstBruteForce(e, topk, queryPred, k)
  }

  /** DURABLE navigable-neighbor-graph index — [[beamSearchRecallAtK]]'s
    * build-once state (VERDICT r16 #3, the q56/q75 convention): the r16
    * in-session path rebuilt the top-m graph per session
    * (Materialize.cachedSingleton); production builds it ONCE at ingest.
    * Writes two placed relations:
    *  - the IVF index at `path` ([[writeIndex]]'s layout: assignment
    *    partitioned by cell + codebook sidecar) — the ENTRY structure;
    *  - the top-m neighbor graph as a src-bucketed, bucket-sorted
    *    catalog table — the HOP structure, exactly the q105 PageRank
    *    edge-relation shape, so each hop's frontier×edges equi-join
    *    leaves the graph side unshuffled (spec-asserted).
    * Same deterministic sample codebook and the same graph rows as the
    * in-session build (bit-identical serve, SimilaritySpec). */
  def writeBeamGraphIndex(emb: DataFrame, path: String, graphTable: String,
      nCells: Int = 0, nProbe: Int = 2, m: Int = 6, buckets: Int = 8): Unit = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    val cents = collectCentroids(e, resolveCells(e, nCells))
    writeIndexWith(e, cents, path)
    val assigned = assignCells(e, cents).drop("best_sim")
    val allQ = e.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qnrm"))
    val edges = ivfProbeJoin(assigned, allQ, cents, m, nProbe,
      probeBroadcast = false, pruneScan = false, sorted = false)
      .select(col("qid").as("src"), col("neighbor").as("dst"))
    graft.io.Lake.writeBucketed(edges.repartition(buckets, col("src")),
      graphTable, "src", buckets, Some("src"))
    writeGraphMetaSidecar(emb.sparkSession, path, m, nProbe, buckets)
  }

  /** Build parameters the incremental maintainer must replay exactly —
    * a plain sidecar file next to the codebook (same publish-by-rename
    * protocol): `m \t nProbe \t buckets`. An append with different
    * parameters would silently break the append ≡ rebuild identity, so
    * they are index state, not caller arguments. */
  private def writeGraphMetaSidecar(spark: SparkSession, path: String,
      m: Int, nProbe: Int, buckets: Int): Unit = {
    val dst = new org.apache.hadoop.fs.Path(s"$path/graphmeta.tsv")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/graphmeta.tsv.tmp")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(s"$m\t$nProbe\t$buckets\n".getBytes("UTF-8"))
    finally out.close()
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"could not publish graph meta at $dst")
  }

  private def readGraphMeta(spark: SparkSession,
      path: String): (Int, Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/graphmeta.tsv")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no graph meta at $p — the index predates " +
      "incremental maintenance; rebuild with writeBeamGraphIndex")
    val in = fs.open(p)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().next() finally in.close()
    val Array(m, nProbe, buckets) = line.trim.split('\t')
    (m.toInt, nProbe.toInt, buckets.toInt)
  }

  /** Incremental beam-graph maintenance — [[writeBeamGraphIndex]]'s
    * append path (the [[appendToIndex]] convention lifted to the HOP
    * structure): new vectors join the IVF assignment under the FROZEN
    * stored codebook, get their own probed-cell top-m edges over the
    * full (old ∪ new) corpus, and REPAIR the existing graph — an old
    * node's neighbor list changes exactly when a new vector lands in
    * one of its probed cells, and top-m(old list ∪ new candidates) =
    * top-m(all candidates) because the old list already IS the top-m of
    * the old candidates (the top-k merge identity). With the codebook
    * frozen the result is BIT-IDENTICAL to a from-scratch
    * [[writeBeamGraphIndex]] over the union with the same codebook
    * (SimilaritySpec append≡rebuild property) — the graph never decays
    * under appends, unlike heuristic HNSW inserts which only relink the
    * nodes the insert search happened to visit.
    *
    * Scale shape: the new batch is assigned narrowly (stored-codebook
    * argmax per row), its edges come from one partition-pruned probe
    * join, and the repair side prunes the OLD corpus to nodes probing a
    * touched cell (an in-row filter against the ≤nCells-entry touched
    * set) before the broadcast-sized join with the new batch — no
    * old-corpus shuffle anywhere. The final publish rewrites the
    * bucketed table read-modify-write (the [[graft.ops.Recs
    * .appendToCoVisitIndex]] convention; at lake scale only the buckets
    * of repaired srcs need rewriting). New ids must be NEW — a re-sent
    * vec_id would duplicate assignment rows upstream in
    * [[appendToIndex]] (same contract as there). */
  /** @param into target table for the merged graph; defaults to an
    *             in-place bucket-level swap of `graphTable` — pass a
    *             different name to keep the old graph immutable (the
    *             appendToWeightedEdgeIndex crash-safe-publish option) */
  def appendToBeamGraphIndex(newEmb: DataFrame, path: String,
      graphTable: String, into: String = ""): Unit = {
    val spark = newEmb.sparkSession
    val target = if (into.isEmpty) graphTable else into
    val (m, nProbe, buckets) = readGraphMeta(spark, path)
    val cents = readIndexCodebook(spark, path)
    require(cents.nonEmpty, s"no codebook at $path — writeIndex first")
    val oldAssigned = readAssignment(spark, path)
    val newAssigned = assignmentForIndex(newEmb, path)
    appendToIndex(newEmb, path)
    val fullAssigned = readAssignment(spark, path)
    // edges of the NEW nodes: probed-cell top-m over the full corpus —
    // exactly the build's probe join, query side = the new batch only
    val newQ = withNorm(newEmb).filter(col("nrm") > 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val newEdges = ivfProbeJoin(fullAssigned, newQ, cents, m, nProbe,
      probeBroadcast = true, pruneScan = true, sorted = false)
      .select(col("qid").as("src"), col("neighbor").as("dst"),
        col("sim"))
    // repair candidates: (old node u, new node w) where w's cell is one
    // of u's probed cells. u's probed cells are recomputed in-row from
    // the frozen codebook (the same probeCells projection the build's
    // probe join used), pruned to the new batch's touched cells first.
    val touched = newAssigned.select(col("cell")).distinct().collect()
      .map(_.getLong(0)).toIndexedSeq
    val oldQ = oldAssigned.select(col("vec_id").as("qid"),
      col("v").as("qv"), col("nrm").as("qnrm"))
    val cands = probeCells(oldQ, cents, nProbe)
      .filter(col("cell").isin(touched: _*))
      .join(broadcast(newAssigned.select(col("cell"),
        col("vec_id").as("dst"), col("v").as("dv"),
        col("nrm").as("dnrm"))), "cell")
      .select(col("qid").as("src"), col("dst"),
        cosine(col("qv"), col("qnrm"), col("dv"), col("dnrm")).as("sim"))
    // merged lists for repaired srcs: top-m of (stored list with sims
    // recomputed UNROUNDED — ranking on stored rounded values could
    // flip sub-1e-6 ties vs a rebuild) ∪ (new candidates)
    val old = spark.table(graphTable)
    // small (≤ old-corpus ids) but derived from the probe join — pin it:
    // three consumers below (repair scoring, the touched-bucket listing,
    // the kept-rows anti-join) must not re-run that join each
    val repairSrcs = cands.select(col("src")).distinct().localCheckpoint()
    val oldScored = old.join(repairSrcs, Seq("src"), "left_semi")
      .join(oldAssigned.select(col("vec_id").as("src"),
        col("v").as("sv"), col("nrm").as("snrm")), "src")
      .join(oldAssigned.select(col("vec_id").as("dst"),
        col("v").as("dv"), col("nrm").as("dnrm")), "dst")
      .select(col("src"), col("dst"),
        cosine(col("sv"), col("snrm"), col("dv"), col("dnrm")).as("sim"))
    val wTop = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst"))
    val repaired = oldScored.unionByName(cands)
      .withColumn("__rk", row_number().over(wTop))
      .filter(col("__rk") <= m)
      .select(col("src"), col("dst"))
    // BUCKET-LEVEL publish (guide §6; VERDICT r18 #1): only the buckets
    // holding a repaired or new src rewrite — their new content is the
    // bucket's kept old rows (srcs not repaired) ∪ repaired lists ∪ the
    // new nodes' lists; every other bucket's file is reused as-is. The
    // staging-table write inside rewriteBuckets materializes the merge
    // BEFORE any base file moves, which replaces the old eager
    // localCheckpoint (the full-table publish had to checkpoint because
    // it dropped the very table its plan was reading).
    // new-node srcs come off the (already materialized) assignment, NOT
    // off newEdges — listing the touched buckets through newEdges would
    // re-execute the probe join just to learn the batch's ids. A new
    // vector with zero candidates contributes no rows; its bucket being
    // listed as touched is harmless (the bucket's kept rows republish
    // unchanged).
    val touchedSrcs = repairSrcs
      .unionByName(newAssigned.select(col("vec_id").as("src"))).distinct()
    val touchedBuckets = touchedSrcs
      .select(graft.io.Lake.bucketIdColumn(col("src"), buckets).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val keepOld = graft.io.Lake.readBuckets(spark, graphTable, touchedBuckets)
      .join(repairSrcs, Seq("src"), "left_anti")
    val merged = keepOld
      .unionByName(repaired)
      .unionByName(newEdges.select(col("src"), col("dst")))
      .repartition(buckets, col("src"))
    graft.io.Lake.rewriteBuckets(spark, graphTable, target, merged,
      touchedBuckets, "src", buckets, Some("src"))
  }

  /** Beam-search ANN for EXTERNAL query vectors served from the durable
    * graph ([[writeBeamGraphIndex]]) — the [[ivfTopKFromIndexFor]] shape
    * upgraded with graph hops: IVF entry off the stored codebook
    * (partition-pruned to the probed cell directories), then `hops`
    * relational expand/rescore/re-beam rounds where the whole query
    * set's frontier advances through the PLACED edge table in one
    * equi-join per hop. Returns (qid, rnk, neighbor, sim) top-k per
    * query. Corpus rows whose vec_id equals a query id are excluded
    * (the "neighbors of this document" contract). */
  def beamTopKFromIndexFor(spark: SparkSession, path: String,
      graphTable: String, queries: DataFrame, k: Int, nProbe: Int = 2,
      beam: Int = 8, hops: Int = 2): DataFrame = {
    val q = withNorm(queries).filter(col("nrm") > 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    beamFromIndexCore(spark, path, graphTable, q, k, nProbe, beam, hops)
  }

  /** [[beamSearchRecallAtK]] replayed from the durable graph index: same
    * query set (index members matching `queryPred`), same entry, same
    * hops, same brute-force ground truth — the recall row matches the
    * in-session number bit-for-bit (SimilaritySpec), proving the lake
    * graph serves exactly what the session build served. */
  def beamSearchRecallAtKFromIndex(spark: SparkSession, path: String,
      graphTable: String, queryPred: Column, k: Int, nProbe: Int = 2,
      beam: Int = 8, hops: Int = 2): DataFrame = {
    val assigned = readAssignment(spark, path)
    val e = assigned.select(col("vec_id"), col("v"), col("nrm"))
    val q = assigned.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val topk = beamFromIndexCore(spark, path, graphTable, q, k, nProbe,
      beam, hops).select(col("qid"), col("neighbor"))
    recallAgainstBruteForce(e, topk, queryPred, k)
  }

  /** Shared serve core over a prepared (qid, qv, qnrm) query frame. */
  private def beamFromIndexCore(spark: SparkSession, path: String,
      graphTable: String, q: DataFrame, k: Int, nProbe: Int, beam: Int,
      hops: Int): DataFrame = {
    require(k >= 1 && beam >= k, s"need beam >= k >= 1, got beam=$beam k=$k")
    require(hops >= 0, s"need hops >= 0, got $hops")
    val cents = readIndexCodebook(spark, path)
    if (cents.isEmpty) return emptyTopK(spark)
    val assigned = readAssignment(spark, path)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val nodes = assigned.select(col("vec_id").as("node"), col("v").as("nv"),
      col("nrm").as("nnrm"))
    val edges = spark.table(graphTable)
    val wBeam = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("node"))
    var frontier = ivfProbeJoin(assigned, q, cents, beam, nProbe,
      probeBroadcast = true, pruneScan = true, sorted = false)
      .select(col("qid"), col("neighbor").as("node"))
    val frontiers = Seq.newBuilder[DataFrame]
    frontiers += frontier
    for (_ <- 1 to hops) {
      val cand = frontier
        .unionAll(frontier.join(edges, frontier("node") === edges("src"))
          .select(col("qid"), col("dst").as("node")))
        .filter(col("node") =!= col("qid"))
        .dropDuplicates("qid", "node")
      frontier = cand
        .join(q, "qid").join(nodes, "node")
        .withColumn("sim", cosine(col("qv"), col("qnrm"), col("nv"), col("nnrm")))
        .withColumn("__rk", row_number().over(wBeam))
        .filter(col("__rk") <= beam)
        .select(col("qid"), col("node"))
      frontiers += frontier
    }
    val visited = frontiers.result().reduce(_.unionAll(_))
      .dropDuplicates("qid", "node")
    visited
      .join(q, "qid").join(nodes, "node")
      .withColumn("sim", cosine(col("qv"), col("qnrm"), col("nv"), col("nnrm")))
      .withColumn("__rk", row_number().over(wBeam))
      .filter(col("__rk") <= k)
      .select(col("qid"), col("__rk").cast("long").as("rnk"),
        col("node").as("neighbor"), round(col("sim"), 6).as("sim"))
  }

  /** Recall@k of the *sample-codebook* IVF path (first-nCells centroids —
    * [[collectCentroids]]) vs exact brute force. Unlike [[ivfRecallAtK]]'s
    * KMeans codebook, every step here is SQL-replayable, so the declared
    * query (q55) is fully hash-checked against the DuckDB oracle. */
  def ivfRecallAtKSample(emb: DataFrame, queryPred: Column, k: Int,
      nCells: Int = 0, nProbe: Int = 2): DataFrame = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    recallAgainstBruteForce(e,
      ivfTopKWith(e, collectCentroids(e, resolveCells(e, nCells)), queryPred,
        k, nProbe),
      queryPred, k)
  }

  /** Per-query recall = |ivf ∩ brute-force top-k| / k, one row per query
    * vector. `e` must already be norm-filtered. */
  private def recallAgainstBruteForce(e: DataFrame, ivf: DataFrame,
      queryPred: Column, k: Int): DataFrame = {
    val hits = ivf.select(col("qid"), col("neighbor"), lit(1).as("hit"))
    val qv = e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val cand = e
      .select(col("vec_id").as("neighbor"), col("v").as("nv"), col("nrm").as("nnrm"))
    val bf = bruteForceTopK(cand, qv, k).select(col("qid"), col("neighbor"))
    bf.join(hits, Seq("qid", "neighbor"), "left")
      .groupBy(col("qid"))
      .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / k).as("recall"))
      .orderBy("qid")
  }

  // -- Durable (lake-materialized) index ----------------------------------

  /** Write the IVF index to the lake: the cell assignment
    * (vec_id, v, nrm, cang) PARTITIONED BY cell under `path/assignment`,
    * plus the codebook as a sidecar file at `path/codebook.tsv`. This is
    * the reference's partitioned-lake layout applied to index state: at
    * 100 TB an index that lives in session cache is rebuilt per job, while
    * the lake copy is built once and every reader scans only the cell
    * directories its query admits ([[cosinePairsBlockedFromIndex]],
    * [[ivfTopKFromIndex]]). Deterministic sample codebook; see
    * [[writeIndexKMeans]] for the trained variant. */
  def writeIndex(emb: DataFrame, path: String, nCells: Int = 0): Unit = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    writeIndexWith(e, collectCentroids(e, resolveCells(e, nCells)), path)
  }

  /** [[writeIndex]] with a seeded MLlib KMeans codebook — the production
    * index build: trained cells are balanced, so partition sizes are even
    * and admissibility prunes more cell pairs. */
  def writeIndexKMeans(emb: DataFrame, path: String, nCells: Int = 0,
      seed: Long = 42L): Unit = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    writeIndexWith(e, kmeansCentroids(e, resolveCells(e, nCells), seed), path)
  }

  private def writeIndexWith(e: DataFrame, cents: Seq[Centroid], path: String): Unit = {
    val spark = e.sparkSession
    assignCells(e, cents)
      .withColumn("cang", acos(least(greatest(col("best_sim"), lit(-1.0)), lit(1.0))))
      .drop("best_sim")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/assignment")
    writeCodebookSidecar(spark, path, cents)
  }

  /** The codebook is ≤ maxAutoCells rows of driver-side state — writing
    * it through a Spark job (coalesce(1) parquet) costs a task round-trip
    * at build AND a collect job at every serve. It is instead a plain
    * sidecar FILE (Delta-commit-log style): one line per centroid,
    * `cid \t cnrm \t v0,v1,...` with `Double.toString` (exact round-trip
    * by definition), published by write-tmp-then-rename so readers never
    * see a torn codebook. */
  private def writeCodebookSidecar(spark: SparkSession, path: String,
      cents: Seq[Centroid]): Unit = {
    val dst = new org.apache.hadoop.fs.Path(s"$path/codebook.tsv")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/codebook.tsv.tmp")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try {
      val sb = new StringBuilder
      cents.foreach { c =>
        sb.append(c.cid).append('\t').append(c.cnrm).append('\t')
        var i = 0
        while (i < c.cv.length) {
          if (i > 0) sb.append(',')
          sb.append(c.cv(i)); i += 1
        }
        sb.append('\n')
      }
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"could not publish codebook at $dst")
  }

  /** Codebook read-back — a driver-side sidecar file read, zero Spark
    * jobs (the serving paths call this per query). */
  def readIndexCodebook(spark: SparkSession, path: String): Seq[Centroid] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/codebook.tsv")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val in = fs.open(p)
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toString("UTF-8")
    } finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(cid, cnrm, vs) = line.split('\t')
      Centroid(cid.toLong, vs.split(',').map(_.toDouble), cnrm.toDouble)
    }.toSeq.sortBy(_.cid)
  }

  /** Compact an ANN index's assignment table after a run of appends:
    * each [[appendToIndex]] / [[appendToPqIndex]] / streaming micro-batch
    * adds a file per touched cell directory, and serving cost grows with
    * file count. Delegates to [[graft.io.Lake.compact]] (swap-published —
    * readers never see a half-compacted table); the cell partitioning is
    * preserved, so serving stays partition-pruned. Applies to BOTH index
    * layouts — [[writeIndex]]'s (vectors) and [[writePqIndex]]'s (codes) —
    * since both store `assignment` partitioned by cell. */
  def compactIndex(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    graft.io.Lake.compact(spark, s"$path/assignment", Seq("cell"),
      targetFileBytes)
  }

  /** Assignment read-back. The partition column comes back as the
    * directory-name integer type; restore long so downstream joins and
    * literals line up with the in-session path. (The cast commutes with
    * partition pruning: an IN filter over the cast column still reaches
    * the scan as a partition filter.) */
  private def readAssignment(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/assignment")
      .withColumn("cell", col("cell").cast("long"))

  /** Incremental index maintenance: assign NEW vectors with the index's
    * STORED codebook and append them to the partitioned assignment — no
    * rebuild, no rewrite of existing cell directories. Exactness is
    * untouched: the admissibility bound holds for ANY codebook, and the
    * serving paths always recompute radii from the live assignment, so
    * pairs served after an append equal a from-scratch search over the
    * union. (What drifts with the corpus is pruning/recall QUALITY —
    * re-train via [[writeIndexKMeans]] when the distribution moves.) */
  def appendToIndex(emb: DataFrame, path: String): Unit =
    assignmentForIndex(emb, path)
      .write.mode("append").partitionBy("cell").parquet(s"$path/assignment")

  /** One batch of (vec_id, embedding) rows turned into assignment rows
    * (vec_id, v, nrm, cell, cang) for the index at `path`, using its
    * STORED codebook — the shared projection behind [[appendToIndex]]
    * and the exactly-once streaming maintainer
    * (`StreamSink.toIvfLandings`). Pure narrow work: codebook is a
    * driver-side sidecar read, assignment a per-row argmax. */
  def assignmentForIndex(emb: DataFrame, path: String): DataFrame = {
    val cents = readIndexCodebook(emb.sparkSession, path)
    require(cents.nonEmpty, s"no codebook at $path — writeIndex first")
    val e = withNorm(emb).filter(col("nrm") > 0)
    assignCells(e, cents)
      .withColumn("cang", acos(least(greatest(col("best_sim"), lit(-1.0)), lit(1.0))))
      .drop("best_sim")
  }

  /** [[cosinePairsBlockedFromIndex]] over the base assignment PLUS the
    * exactly-once streaming landings at `landPath`
    * (`StreamSink.toIvfLandings` layout: `batch=<id>/cell=<c>/…`) — the
    * read side of streaming index maintenance. Radii are recomputed
    * over the union, so the lossless-blocking proof covers streamed
    * vectors with the same force as base ones: the served pair set
    * equals a from-scratch search over everything ever admitted. A
    * missing `landPath` (nothing streamed yet) serves the base index
    * alone. */
  def cosinePairsBlockedFromIndexWithLandings(spark: SparkSession,
      path: String, landPath: String, threshold: Double): DataFrame = {
    val cents = readIndexCodebook(spark, path)
    if (cents.isEmpty) return emptyPairs(spark)
    val base = readAssignment(spark, path)
    // readLandings guards on actual data files, not directory existence
    // (a crash can leave only a .staging-* dir, an all-filtered
    // micro-batch an empty batch=<id> partition — ADVICE r14), and
    // resolves compaction generations, so this serve path keeps working
    // across [[graft.io.Landings.compactLandings]] folds.
    val all = graft.io.Landings.readLandings(spark, landPath) match {
      case None => base
      case Some(land) => base.unionByName(
        land.drop("batch").withColumn("cell", col("cell").cast("long")))
    }
    pairsOverAssigned(all, cents, threshold, memoRadii = false)
  }

  /** ANN serving for EXTERNAL query vectors (any (vec_id, embedding)
    * frame — not required to be index members): probe the stored
    * codebook, scan only the probed cell directories. A corpus row whose
    * vec_id equals a query id is excluded, preserving the
    * "neighbors of this document" contract when queries overlap the
    * corpus id space. */
  def ivfTopKFromIndexFor(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nProbe: Int, probeBroadcast: Boolean = true): DataFrame = {
    val cents = readIndexCodebook(spark, path)
    if (cents.isEmpty) return emptyTopK(spark)
    val q = withNorm(queries).filter(col("nrm") > 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    ivfProbeJoin(
      readAssignment(spark, path).select(col("vec_id"), col("v"), col("nrm"), col("cell")),
      q, cents, k, nProbe, probeBroadcast, pruneScan = true)
  }

  /** [[cosinePairsBlocked]] served from the durable index: codebook from
    * the sidecar, assignment scanned partition-pruned to admissible cells
    * (the IN filter in [[pairsOverAssigned]] is a driver-side literal, so
    * it prunes the file listing itself). Identical output to the
    * in-session path over the same corpus. */
  def cosinePairsBlockedFromIndex(spark: SparkSession, path: String,
      threshold: Double): DataFrame = {
    val cents = readIndexCodebook(spark, path)
    if (cents.isEmpty) return emptyPairs(spark)
    pairsOverAssigned(readAssignment(spark, path), cents, threshold,
      memoRadii = false)
  }

  /** Semantic dedup (the SemDeDup shape) SERVED from the durable IVF
    * index — the embedding-space twin of
    * [[graft.ops.Dedup.dedupSurvivorsFromIndex]]: cosine near-dup pairs
    * from the lake assignment ([[cosinePairsBlockedFromIndex]] — exact
    * pair set, lossless cell blocking, no embedding recomputation),
    * clustered by [[graft.ops.Dedup.connectedComponents]], one
    * representative (min id) kept per cluster. Returns `items` minus
    * every non-representative cluster member. Zero-norm vectors can
    * never pair, so they always survive — on both engines. At 100 TB
    * this runs exactly like the text loop: vectors are admitted through
    * [[appendToIndex]] / `StreamSink.toIndex` at ingest and the periodic
    * semantic sweep reads only the index tables. */
  def semanticDedupSurvivorsFromIndex(spark: SparkSession, items: DataFrame,
      idCol: String, path: String, threshold: Double): DataFrame = {
    val pairs = cosinePairsBlockedFromIndex(spark, path, threshold)
      .select(col("ida").as("da"), col("idb").as("db"))
    graft.ops.Dedup.dedupSurvivors(items, idCol, pairs)
  }

  /** IVF top-k served from the durable index: queries are rows of the
    * index matching `queryPred`; the corpus scan is pruned to the union
    * of probed cells — a ≤nCells driver-side set pushed as a literal
    * partition filter, so only the probed cell directories are read.
    *
    * `pruneScan`: right for POINT serves (few queries probe few cells —
    * the q56 shape, where skipping unprobed cell directories is the
    * whole win). For a BULK serve whose query set is a large corpus
    * sample, the probed-cell union covers ~every cell, so the pruning
    * pass is a pure extra job + assignment scan that prunes nothing —
    * pass false (measured on q107: the collect job + duplicate scan
    * was ~25% of the serve; see tools/RrfProbe). */
  def ivfTopKFromIndex(spark: SparkSession, path: String, queryPred: Column,
      k: Int, nProbe: Int, probeBroadcast: Boolean = true,
      pruneScan: Boolean = true, sorted: Boolean = true): DataFrame = {
    val cents = readIndexCodebook(spark, path)
    if (cents.isEmpty) return emptyTopK(spark)
    val assigned = readAssignment(spark, path)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val queries = assigned.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    ivfProbeJoin(assigned, queries, cents, k, nProbe, probeBroadcast,
      pruneScan = pruneScan, sorted = sorted)
  }

  /** HARD-NEGATIVE mining from the durable IVF index — the
    * training-pair op behind contrastive embedding/retriever training
    * (DPR/SimCSE-style): for each query the candidates that look
    * similar enough to be CONFUSABLE but are not near-duplicates, i.e.
    * probed-cell candidates whose exact cosine lands in [lo, hi) —
    * below the dedup threshold (`hi`, the [[cosinePairsBlocked]]
    * near-dup bar: a near-dup is a false negative, not a hard one),
    * above the easy-negative floor (`lo`: random pairs teach nothing).
    * The k HARDEST (highest sim, id-tie-broken) per query return as
    * (qid, rnk, neighbor, sim).
    *
    * Plan shape is exactly the [[ivfTopKFromIndex]] serve — codebook
    * sidecar, partition-prunable assignment scan, one probe equi-join,
    * one bounded window — with the band filter applied to the
    * UNROUNDED sim before ranking. Mining negatives this way costs the
    * same as serving a query: no extra pass over the corpus, which is
    * the point at 100 TB — the candidate generator IS the index. */
  def ivfHardNegativesFromIndex(spark: SparkSession, path: String,
      queryPred: Column, k: Int, nProbe: Int, lo: Double, hi: Double,
      probeBroadcast: Boolean = true, pruneScan: Boolean = true,
      sorted: Boolean = true): DataFrame = {
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val cents = readIndexCodebook(spark, path)
    if (cents.isEmpty) return emptyTopK(spark)
    val assigned = readAssignment(spark, path)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val queries = assigned.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    ivfProbeJoin(assigned, queries, cents, k, nProbe, probeBroadcast,
      pruneScan = pruneScan, sorted = sorted, simBand = Some((lo, hi)))
  }

  /** Public (vec_id, cell) assignment under the deterministic sample
    * codebook — the clustering signal for cluster-BALANCED curation
    * ([[graft.ops.Curation]] composes it with per-cell top-k to pick a
    * diverse corpus slice) and any other consumer that wants the IVF
    * geometry without a search. One stateless projection per row
    * (nCells compiled dots against the plan-literal codebook), no
    * shuffle; the same assignment the IVF search/index family uses, so
    * it is SQL-replayable by the shared oracle CTEs. */
  def cellAssignments(emb: DataFrame, nCells: Int = 0): DataFrame = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    val cents = collectCentroids(e, resolveCells(e, nCells))
    assignCells(e, cents).select(col("vec_id"), col("cell"))
  }

  private def emptyPairs(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("ida"), col("id").as("idb"),
      col("id").cast("double").as("sim"))

  private def emptyTopK(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("qid"), col("id").as("rnk"),
      col("id").as("neighbor"), col("id").cast("double").as("sim"))

  private val radiiCache =
    new java.util.concurrent.ConcurrentHashMap[(Any, Long), Map[Long, Double]]()

  private def collectRadii(assigned: DataFrame, memo: Boolean): Map[Long, Double] = {
    def compute = assigned.groupBy(col("cell")).agg(max(col("cang")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    if (!memo) compute
    else {
      if (radiiCache.size > 16) radiiCache.clear()
      val key = (assigned.queryExecution.analyzed.canonicalized,
        Materialize.generation(assigned.sparkSession))
      radiiCache.computeIfAbsent(key, _ => compute)
    }
  }

  /** Bounded plan-keyed memo for driver-side index state (codebooks):
    * keys are canonicalized plans (structural equality = Spark's
    * sameResult), a handful of entries at most — cleared wholesale if it
    * ever grows past 8 corpora, and externally via
    * [[clearIndexCaches]] when data is rewritten under an indexed path
    * (plan keys cannot see file contents, only the reading plan). */
  private final class PlanMemo[K, V] {
    private val m = new java.util.concurrent.ConcurrentHashMap[(Any, K), V]()
    def getOrElseUpdate(df: DataFrame, k: K)(build: => V): V = {
      if (m.size > 8) m.clear()
      m.computeIfAbsent((df.queryExecution.analyzed.canonicalized, k), _ => build)
    }
    def clear(): Unit = m.clear()
  }

  private val centCache = new PlanMemo[Int, Seq[Centroid]]

  private val countCache = new PlanMemo[Unit, Long]

  /** Auto-sized cell count: nCells ≈ √n balances the per-row assignment
    * cost (nCells dot products) against the average cell population
    * (n/nCells) — both grow as √n, the classic IVF sizing. Floor 16 so
    * tiny corpora keep replayable behavior; cap 4096 so the plan-literal
    * codebook (nCells × dim doubles, constant-folded to a single
    * Literal) stays far below broadcast/driver limits. The corpus count
    * is memoized on the plan — sizing is an index-build cost, not a
    * per-search one. Entry points take `nCells = 0` to mean "derive". */
  private[graft] def autoCells(e: DataFrame): Int = {
    val n = countCache.getOrElseUpdate(e, ())(e.count())
    math.min(4096, math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))
  }

  private def resolveCells(e: DataFrame, nCells: Int): Int =
    if (nCells > 0) nCells else autoCells(e)

  /** Drop all driver-side index state (codebook memos) and unpersist the
    * materialized assignment slots. Call after rewriting data under a
    * path that was previously indexed (alongside
    * `spark.catalog.clearCache()`): the memos are keyed on the
    * canonicalized plan, so a rewrite at the SAME path produces the same
    * key and would otherwise return the old codebook. A stale codebook
    * cannot lose pairs (see [[cosinePairsBlocked]] — radii are always
    * recomputed from the live assignment), but it degrades pruning and
    * IVF recall until cleared. */
  def clearIndexCaches(): Unit = {
    kmeansCache.clear()
    pqKmeansCache.clear()
    centCache.clear()
    countCache.clear()
    radiiCache.clear()
    Materialize.clearAll()
  }

  /** First-nCells deterministic codebook (lowest vec_ids — a top-K heap
    * scan, not a global sort), collected driver-side (nCells × dim
    * doubles — the same scale as any broadcast variable). Selecting by
    * order instead of `vec_id < nCells` keeps the codebook non-empty for
    * id spaces that don't start at 0 (e.g. a filtered corpus slice).
    * Memoized on the corpus plan: the codebook is index state, rebuilt
    * only when the corpus changes. */
  private def collectCentroids(e: DataFrame, nCells: Int): Seq[Centroid] =
    centCache.getOrElseUpdate(e, nCells)(collectCentroidsUncached(e, nCells))

  private def collectCentroidsUncached(e: DataFrame, nCells: Int): Seq[Centroid] =
    e.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id"), col("v"), col("nrm"))
      .collect()
      .map(r => Centroid(r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_.cid)
      .toSeq

  /** Literal array<struct<cv,cnrm>> of the codebook, cid-ascending. */
  private def centLiteral(cents: Seq[Centroid]): Column =
    array(cents.map(c =>
      struct(typedLit(c.cv.toSeq).as("cv"), lit(c.cnrm).as("cnrm"))): _*)

  /** Per-row cosine to every centroid: an nCells-element array computed in
    * one projection (compiled dot inside the HOF lambda). */
  private def cellSims(centArr: Column, v: Column, nrm: Column): Column =
    transform(centArr, c => dot(v, c("cv")) / (nrm * c("cnrm")))

  /** Nearest-centroid assignment as a pure projection: argmax of the
    * per-row sim array; first max position = lowest cid on ties, matching
    * the (csim DESC, cid ASC) order the oracle replays. Adds
    * `cell` and `best_sim`; carries vec_id, v, nrm. */
  private def assignCells(e: DataFrame, cents: Seq[Centroid]): DataFrame = {
    val cidArr = typedLit(cents.map(_.cid))
    e.withColumn("csims", cellSims(centLiteral(cents), col("v"), col("nrm")))
      .withColumn("best_sim", array_max(col("csims")))
      .withColumn("cell", element_at(cidArr,
        array_position(col("csims"), col("best_sim")).cast("int")))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"), col("best_sim"))
  }

  /** Shared IVF pipeline over a driver-side codebook. Assignment and probe
    * are both shuffle-free projections; the only wide operations left are
    * the cell join (probe side broadcast — the corpus never moves) and the
    * final per-query top-k. */
  private def ivfTopKWith(e: DataFrame, cents: Seq[Centroid], queryPred: Column,
      k: Int, nProbe: Int, probeBroadcast: Boolean = true): DataFrame = {
    if (cents.isEmpty) // empty corpus ⇒ no neighbors
      return e.limit(0).select(col("vec_id").as("qid"), col("vec_id").as("rnk"),
        col("vec_id").as("neighbor"), col("nrm").as("sim"))
    val assigned = assignCells(e, cents).drop("best_sim")
    val queries = e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    ivfProbeJoin(assigned, queries, cents, k, nProbe, probeBroadcast,
      pruneScan = false)
  }

  /** The IVF serving join over an assignment frame (vec_id, v, nrm, cell)
    * and a query frame (qid, qv, qnrm) — shared by the in-session path
    * (assignment is a projection) and the durable-index path (assignment
    * is a partitioned lake scan, `pruneScan = true`). */
  /** Top-`nProbe` probed cells per query row as a pure projection —
    * (qid, qv, qnrm) exploded to one row per probed cell. The (−sim,
    * cid) struct sort replays (csim DESC, cid ASC) exactly. Shared by
    * the probe join and the append-time neighbor repair
    * ([[appendToBeamGraphIndex]]), which must reproduce the SAME probed
    * cells the build used. */
  private def probeCells(queries: DataFrame, cents: Seq[Centroid],
      nProbe: Int): DataFrame = {
    val cidArr = typedLit(cents.map(_.cid))
    queries.select(col("qid"), col("qv"), col("qnrm"),
      explode(transform(
        slice(array_sort(zip_with(
          cellSims(centLiteral(cents), col("qv"), col("qnrm")), cidArr,
          (s, c) => struct((-s).as("negsim"), c.as("cid")))), 1, nProbe),
        x => x("cid"))).as("cell"))
  }

  private def ivfProbeJoin(assigned: DataFrame, queries: DataFrame,
      cents: Seq[Centroid], k: Int, nProbe: Int, probeBroadcast: Boolean,
      pruneScan: Boolean, sorted: Boolean = true,
      simBand: Option[(Double, Double)] = None): DataFrame = {
    // query-time: top-nProbe cells = sort of an nCells-element array per
    // row — (−sim, cid) struct sort replays (csim DESC, cid ASC) exactly
    val probes = probeCells(queries, cents, nProbe)
    // durable-index serving: the union of probed cells is a ≤nCells
    // driver-side set (one tiny job over the query frame) — pushing it as
    // a literal IN makes the corpus read a static partition-pruned scan
    // that never opens the unprobed cell directories. In-session the
    // assignment is a projection with no files to skip, so the extra job
    // would be pure overhead (pruneScan = false).
    val corpus =
      if (pruneScan) {
        val cells = probes.select(col("cell")).distinct().collect()
          .map(_.getLong(0)).toIndexedSeq
        assigned.filter(col("cell").isin(cells: _*))
      } else assigned
    val wTop = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    // serving contract: the query set is a bounded working set, so
    // broadcasting it keeps the corpus unshuffled. For BULK k-NN where
    // queries are a large fraction of the corpus, pass
    // probeBroadcast = false and let Spark size the join (broadcasting a
    // corpus-sized probe set would OOM the driver at scale).
    val probeSide = if (probeBroadcast) broadcast(probes) else probes
    val scored = corpus.join(probeSide, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("qnrm"), col("v"), col("nrm")))
    // the band (hard-negative mining) filters on the UNROUNDED sim
    // BEFORE ranking — membership must not depend on output rounding
    val banded = simBand.fold(scored) { case (lo, hi) =>
      scored.filter(col("sim") >= lo && col("sim") < hi)
    }
    val topK = banded
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id").as("neighbor"),
        round(col("sim"), 6).as("sim"))
    // the global (qid, rnk) sort is the DIRECT-serving contract; a
    // consumer that re-aggregates the list (rrfFuse) passes
    // sorted=false — EliminateSorts does NOT fold the sort through the
    // downstream union/repartition, so it would otherwise survive as a
    // range exchange + its range-boundary SAMPLING JOB mid-plan
    // (observed in q107's optimized plan, r12)
    if (sorted) topK.orderBy("qid", "rnk") else topK
  }

  // -----------------------------------------------------------------------
  // Signed random projections (SRP) — hyperplane LSH for cosine
  // -----------------------------------------------------------------------

  /** Near-duplicate pairs by signed-random-projection LSH: each vector
    * gets an `nBits`-bit signature (bit i = sign of ⟨v, h_i⟩ against
    * hyperplane h_i), signatures are cut into bands, and vectors
    * colliding in ANY band become candidates, verified by exact cosine ≥
    * `threshold`. This is the classic Charikar construction — the cosine
    * twin of MinHash banding — and the right tool when the corpus has no
    * cluster structure for [[cosinePairsBlocked]]'s admissibility matrix
    * to exploit: SRP pruning depends only on the pair angle
    * (P[bit match] = 1 − θ/π), never on global geometry.
    *
    * Unlike the blocked-pairs path this is APPROXIMATE: a qualifying pair
    * is found with probability 1 − (1 − p^bandBits)^(nBits/bandBits),
    * p = 1 − θ(threshold)/π. Callers trade recall vs candidate volume by
    * nBits/bandBits exactly as with MinHash bands (more, narrower bands =
    * higher recall AND more candidates).
    *
    * Hyperplanes are the first `nBits` corpus vectors by id — the same
    * deterministic convention as the sample codebook, so the whole
    * pipeline (signature → banding → verify) is SQL-replayable; a
    * production variant would draw Gaussian hyperplanes from a fixed
    * seed, changing only the literal. Signature computation is a pure
    * projection (nBits compiled dots per row, no shuffle); candidate
    * generation is an equi-join on (band, key) — identical subtrees under
    * a shuffle_hash hint, so exchange reuse computes the banded frame
    * once; the verify join-backs read the [[Materialize]]-cached norm
    * frame. No all-pairs stage anywhere. */
  def srpNearDups(emb: DataFrame, threshold: Double, nBits: Int = 16,
      bandBits: Int = 4): DataFrame = {
    require(nBits % bandBits == 0, s"bandBits=$bandBits must divide nBits=$nBits")
    val eRaw = withNorm(emb).filter(col("nrm") > 0)
    val e = Materialize.cachedSingleton("similarity-srp-norm", eRaw)
    val planes = collectCentroids(e, nBits)
    if (planes.size < nBits) // degenerate corpus: fewer vectors than bits
      return e.limit(0).select(col("vec_id").as("ida"), col("vec_id").as("idb"),
        col("nrm").as("sim"))
    val nBands = nBits / bandBits
    // band keys as one projection: key(b) = Σ_j [⟨v,h⟩ > 0] · 2^j — the
    // hyperplane vectors are plan literals, so each dot is a compiled
    // left-fold identical to the oracle's list_reduce
    val bandKey = (b: Int) => (0 until bandBits).map { j =>
      val h = typedLit(planes(b * bandBits + j).cv.toSeq)
      when(dot(col("v"), h) > 0d, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val banded = e.select(col("vec_id"),
        posexplode(array((0 until nBands).map(bandKey): _*)).as(Seq("band", "key")))
    // candidates: equi-join on (band, key); both sides are the same
    // subtree, so shuffle_hash → one exchange, reused
    val cand = banded.as("x").hint("shuffle_hash").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("ida"), col("y.vec_id").as("idb"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("ida"), col("v").as("va"), col("nrm").as("na")), "ida")
      .join(e.select(col("vec_id").as("idb"), col("v").as("vb"), col("nrm").as("nb")), "idb")
      .withColumn("sim", cosine(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("ida"), col("idb"), round(col("sim"), 6).as("sim"))
      .orderBy("ida", "idb")
  }

  // -----------------------------------------------------------------------
  // Product quantization (PQ) — ADC approximate k-NN
  // -----------------------------------------------------------------------

  /** Driver-side PQ codebook: `m` subspaces × `ks` sub-centroids of
    * dimension d/m each — a few KB regardless of corpus size. */
  final case class PqCodebook(m: Int, ks: Int, dsub: Int,
      cents: IndexedSeq[IndexedSeq[Array[Double]]])

  /** Deterministic sample PQ codebook: subspace j's centroids are the
    * j-th subvectors of the first `ks` UNIT-NORMALIZED corpus vectors by
    * id (the [[collectCentroids]] convention, so declared queries stay
    * SQL-replayable; a production variant trains per-subspace k-means,
    * changing only these literals). */
  private[graft] def collectPqCodebook(e: DataFrame, m: Int, ks: Int): PqCodebook = {
    val sample = collectCentroids(e, ks)
    require(sample.size == ks, s"corpus smaller than ks=$ks")
    val d = sample.head.cv.length
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val dsub = d / m
    val cents = (0 until m).map { j =>
      sample.map(c => c.cv.map(_ / c.cnrm).slice(j * dsub, (j + 1) * dsub))
        .toIndexedSeq
    }
    PqCodebook(m, ks, dsub, cents)
  }

  /** Squared L2 distance to a literal centroid, as the SAME left-fold the
    * oracle replays: Σ (x−c)² over the zipped pair, in element order. */
  private def sqDist(s: Column, centroid: Array[Double]): Column = {
    val diff = zip_with(s, typedLit(centroid.toSeq), (a, b) => a - b)
    dot(diff, diff)
  }

  /** HOF reference form of the per-subspace distance table: element c of
    * array j = ||sub_j(v̂) − cent_{j,c}||². Kept as the readable spec twin
    * of the fused [[pqTabs]] (SimilaritySpec asserts bit-equality); the
    * serving paths use the fused expression — building m·ks separate
    * zip_with+dot columns allocates a diff array per centroid per row and
    * was the two largest bench entries (q71/q74). */
  private[graft] def pqDistArraysHof(vhat: Column, cb: PqCodebook): Seq[Column] =
    (0 until cb.m).map { j =>
      val s = slice(vhat, j * cb.dsub + 1, cb.dsub)
      array(cb.cents(j).map(c => sqDist(s, c)): _*)
    }

  /** HOF reference form of the codes: code j = argmin of distance array j
    * (first minimum = lowest centroid id on exact ties). Spec twin of the
    * fused [[pqCodes]]. */
  private[graft] def pqCodesHof(vhat: Column, cb: PqCodebook): Column =
    array(pqDistArraysHof(vhat, cb).map(dj =>
      (array_position(dj, array_min(dj)) - 1).cast("int")): _*)

  /** Codebook flattened [subspace][centroid][element] for the fused
    * expressions — a few KB of plan literal, like [[centLiteral]]. */
  private def flatCb(cb: PqCodebook): Column =
    typedLit(cb.cents.flatMap(_.flatMap(_.toSeq)).toSeq)

  /** Fused ADC distance tables (CatalystExpressions.PqDistTable): one pass
    * of m·ks·dsub multiply-adds per row, zero intermediate allocation,
    * numerically identical to [[pqDistArraysHof]] (same divide, subtract,
    * left-fold order). */
  private[graft] def pqTabs(v: Column, nrm: Column, cb: PqCodebook): Column =
    call_function("graft_pq_tabs", v, nrm, flatCb(cb), lit(cb.m), lit(cb.ks))

  /** Fused PQ codes (CatalystExpressions.PqEncode) — argmin per subspace
    * in the same pass, first minimum on ties like array_position. */
  private[graft] def pqCodes(v: Column, nrm: Column, cb: PqCodebook): Column =
    call_function("graft_pq_codes", v, nrm, flatCb(cb), lit(cb.m), lit(cb.ks))

  /** Compiled ADC fold (CatalystExpressions.AdcDistance):
    * Σ_j tabs[j][codes[j]], left-to-right from 0.0. */
  private[graft] def adc(codes: Column, tabs: Column): Column =
    call_function("graft_pq_adc", codes, tabs)

  /** Approximate k-NN by product quantization with asymmetric distance
    * computation (ADC) — the memory side of ANN at 100 TB: each corpus
    * vector is stored as `m` small codes (m bytes at ks ≤ 256) instead of
    * d floats — 32× compression at d=64, m=8 — and the scan computes
    * per-candidate distance as `m` table lookups instead of a d-element
    * dot product. Vectors are unit-normalized first, so ADC distance
    * ranks like cosine (‖â−b̂‖² = 2−2·cos) and results are comparable to
    * [[bruteForceTopK]]/[[ivfTopK]].
    *
    * Plan shape: encoding is a pure projection (m·ks compiled sub-dots
    * over the literal codebook — zero shuffle, exactly like the IVF
    * assignment); queries build their ADC tables with the SAME projection
    * and broadcast; the scan is linear with a per-query top-k window.
    * This is FLAT PQ (every code scanned once per query); the production
    * composition at scale is IVF-PQ — [[ivfTopK]]'s cell pruning with
    * these codes as the payload — which shares both projections and
    * changes only what the cell join carries.
    *
    * Approximate BY DESIGN (quantization error shifts ranks near ties);
    * deterministic and fully SQL-replayable, so the declared query is
    * hash-checked end to end. */
  def pqTopK(emb: DataFrame, queryPred: Column, k: Int, m: Int = 8,
      ks: Int = 16): DataFrame = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    pqTopKWith(e, collectPqCodebook(e, m, ks), queryPred, k)
  }

  /** PQ with per-subspace MLlib KMeans codebooks (seeded) — the
    * production quantizer: trained sub-centroids roughly double recall
    * over the fixed-sample codebook on this corpus (measured in
    * SimilaritySpec). Training is m small KMeans fits over the subvector
    * slices — index-build cost, memoized on the corpus plan. Not
    * SQL-replayable (like [[ivfTopKKMeans]]); [[pqTopK]] is the declared,
    * oracle-checked variant. */
  def pqTopKKMeans(emb: DataFrame, queryPred: Column, k: Int, m: Int = 8,
      ks: Int = 16, seed: Long = 42L): DataFrame = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    pqTopKWith(e, kmeansPqCodebook(e, m, ks, seed), queryPred, k)
  }

  private val pqKmeansCache = new PlanMemo[(Int, Int, Long), PqCodebook]

  private def kmeansPqCodebook(e: DataFrame, m: Int, ks: Int,
      seed: Long): PqCodebook =
    pqKmeansCache.getOrElseUpdate(e, (m, ks, seed))(
      kmeansPqCodebookUncached(e, m, ks, seed))

  private def kmeansPqCodebookUncached(e: DataFrame, m: Int, ks: Int,
      seed: Long): PqCodebook = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val d = collectCentroids(e, 1).headOption
      .map(_.cv.length)
      .getOrElse(throw new IllegalArgumentException("empty corpus"))
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val dsub = d / m
    val vhat = transform(col("v"), x => x / col("nrm"))
    val cents = (0 until m).map { j =>
      val feat = e.select(
        array_to_vector(slice(vhat, j * dsub + 1, dsub)).as("features"))
      new KMeans().setK(ks).setSeed(seed + j).fit(feat)
        .clusterCenters.map(_.toArray).toIndexedSeq
    }
    PqCodebook(m, ks, dsub, cents)
  }

  /** IVF-PQ: [[ivfTopK]]'s cell pruning carrying [[pqTopK]]'s codes — the
    * production ANN shape at 100 TB. The corpus stores (cell, codes): the
    * coarse quantizer prunes the scan to `nProbe` of `nCells` cells (an
    * equi-join on cell — never a corpus-wide pass) and the fine scan
    * inside the probed cells is the m-lookup ADC, so the full vectors
    * are needed at INDEX time only. Both codebooks are the deterministic
    * samples, so the whole composition is SQL-replayable and the
    * declared query (q74) hash-checks it end to end. */
  def ivfPqTopK(emb: DataFrame, queryPred: Column, k: Int, nCells: Int = 0,
      nProbe: Int = 2, m: Int = 8, ks: Int = 16,
      sorted: Boolean = true): DataFrame = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    val cents = collectCentroids(e, resolveCells(e, nCells))
    val cb = collectPqCodebook(e, m, ks)
    val corpus = assignCells(e, cents)
      .select(col("vec_id"), col("cell"),
        pqCodes(col("v"), col("nrm"), cb).as("codes"))
    val cidArr = typedLit(cents.map(_.cid))
    // probe selection = ivfProbeJoin's: top-nProbe cells by (csim DESC,
    // cid ASC); the ADC tables ride along on the probe rows
    val probes = e.filter(queryPred)
      .select(col("vec_id").as("qid"),
        pqTabs(col("v"), col("nrm"), cb).as("tabs"),
        explode(transform(
          slice(array_sort(zip_with(
            cellSims(centLiteral(cents), col("v"), col("nrm")), cidArr,
            (s, c) => struct((-s).as("negsim"), c.as("cid")))), 1, nProbe),
          x => x("cid"))).as("cell"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))
    val topK = corpus.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("qid"))
      // ADC: Σ_j tabs[j][codes[j]] — the compiled left fold (AdcDistance);
      // this runs once per CANDIDATE, the multiplied hot path
      .withColumn("adist", adc(col("codes"), col("tabs")))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id").as("neighbor"),
        round(col("adist"), 6).as("adist"))
    // a consumer that re-ranks the list (ivfPqRerank) passes
    // sorted=false — the serving sort would survive as a mid-plan range
    // exchange (the q107/rrfFuse finding)
    if (sorted) topK.orderBy("qid", "rnk") else topK
  }

  /** Two-stage PQ serving — ADC shortlist, EXACT re-rank: the standard
    * production repair for ADC's quantization error (Jégou et al.'s
    * IVFADC+R shape). Stage 1 is [[ivfPqTopK]] with k = `r` (the
    * compressed-domain scan that never touches raw vectors); stage 2
    * fetches true vectors for ONLY the |queries|·r shortlist rows —
    * two id-equi point-lookup joins, vec_id-bucketed state at lake
    * scale — recomputes exact cosine, and keeps the top `k`
    * (sim DESC, id ASC).
    *
    * Exactness anchor (spec-asserted): with r = corpus size the
    * shortlist is every probed-cell candidate, so the re-rank
    * degenerates bit-equal to [[ivfTopK]] — the re-rank stage IS exact
    * search restricted to the shortlist, and `r` is the single knob
    * trading ADC recall loss against raw-vector fetches. */
  def ivfPqRerank(emb: DataFrame, queryPred: Column, k: Int, r: Int,
      nCells: Int = 0, nProbe: Int = 2, m: Int = 8,
      ks: Int = 16): DataFrame = {
    require(r >= k, s"shortlist r=$r must be at least k=$k")
    val e = withNorm(emb).filter(col("nrm") > 0)
    val shortlist = ivfPqTopK(emb, queryPred, r, nCells, nProbe, m, ks,
      sorted = false).select(col("qid"), col("neighbor"))
    val wTop = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("neighbor"))
    shortlist
      .join(e.select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm")), "qid")
      .join(e.select(col("vec_id").as("neighbor"), col("v").as("cv"),
        col("nrm").as("cnrm")), "neighbor")
      .withColumn("sim", cosine(col("qv"), col("qnrm"), col("cv"), col("cnrm")))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("neighbor"),
        round(col("sim"), 6).as("sim"))
      .orderBy("qid", "rnk")
  }

  // -----------------------------------------------------------------------
  // Durable IVF-PQ index — (cell, codes) on the lake, vectors at build only
  // -----------------------------------------------------------------------

  /** Durable IVF-PQ index: the lake copy stores (vec_id, codes) partitioned
    * by cell — m small codes instead of d floats per vector, the memory
    * story that makes PQ the 100-TB ANN shape — plus BOTH codebooks as
    * driver-written sidecar files ([[writeCodebookSidecar]] pattern:
    * tmp+rename, zero Spark jobs at serve). Full vectors are read at INDEX
    * time only; [[ivfPqTopKFromIndexFor]] never touches them. */
  def writePqIndex(emb: DataFrame, path: String, nCells: Int = 0,
      m: Int = 8, ks: Int = 16): Unit = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    val spark = e.sparkSession
    val cents = collectCentroids(e, resolveCells(e, nCells))
    val cb = collectPqCodebook(e, m, ks)
    assignCells(e, cents)
      .select(col("vec_id"), col("cell"),
        pqCodes(col("v"), col("nrm"), cb).as("codes"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/assignment")
    writeCodebookSidecar(spark, path, cents)
    writePqCodebookSidecar(spark, path, cb)
  }

  /** [[writePqIndex]] with seeded MLlib KMeans codebooks for BOTH stages
    * (coarse cells via [[kmeansCentroids]], per-subspace quantizers via
    * the [[pqTopKKMeans]] trainer) — the production index build: trained
    * cells balance partition sizes and trained sub-centroids roughly
    * double ADC recall on this corpus (measured in SimilaritySpec).
    * Serving is codebook-agnostic, so [[ivfPqTopKFromIndexFor]] and
    * [[appendToPqIndex]] work identically over either build. */
  def writePqIndexKMeans(emb: DataFrame, path: String, nCells: Int = 0,
      m: Int = 8, ks: Int = 16, seed: Long = 42L): Unit = {
    val e = withNorm(emb).filter(col("nrm") > 0)
    val spark = e.sparkSession
    val cents = kmeansCentroids(e, resolveCells(e, nCells), seed)
    val cb = kmeansPqCodebook(e, m, ks, seed)
    assignCells(e, cents)
      .select(col("vec_id"), col("cell"),
        pqCodes(col("v"), col("nrm"), cb).as("codes"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/assignment")
    writeCodebookSidecar(spark, path, cents)
    writePqCodebookSidecar(spark, path, cb)
  }

  /** Incremental IVF-PQ maintenance: NEW vectors are assigned and encoded
    * with the index's STORED codebooks and appended partition-wise — no
    * rebuild, no rewrite of existing cell directories (the
    * [[appendToIndex]] contract applied to codes). */
  def appendToPqIndex(emb: DataFrame, path: String): Unit = {
    val spark = emb.sparkSession
    val cents = readIndexCodebook(spark, path)
    val cb = readPqCodebook(spark, path)
      .getOrElse(throw new IllegalArgumentException(
        s"no PQ codebook at $path — writePqIndex first"))
    require(cents.nonEmpty, s"no codebook at $path — writePqIndex first")
    val e = withNorm(emb).filter(col("nrm") > 0)
    assignCells(e, cents)
      .select(col("vec_id"), col("cell"),
        pqCodes(col("v"), col("nrm"), cb).as("codes"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/assignment")
  }

  /** IVF-PQ serving for EXTERNAL query vectors from the durable index:
    * codebooks from the sidecars (zero Spark jobs), ADC tables computed on
    * the query side only, and the corpus scan PRUNED to the union of
    * probed cells — a ≤nCells driver-side set pushed as a literal IN, so
    * only the probed cell directories are ever opened, and only their
    * (vec_id, codes) columns read. Over the same corpus and parameters the
    * answer equals [[ivfPqTopK]] exactly (stored codes are exact ints; the
    * sidecar round-trips doubles via toString/parse, which is lossless). */
  def ivfPqTopKFromIndexFor(spark: SparkSession, path: String,
      queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val cents = readIndexCodebook(spark, path)
    val cbOpt = readPqCodebook(spark, path)
    if (cents.isEmpty || cbOpt.isEmpty) return emptyAdcTopK(spark)
    val cb = cbOpt.get
    val q = withNorm(queries).filter(col("nrm") > 0)
    val cidArr = typedLit(cents.map(_.cid))
    // probe selection replays ivfPqTopK's: top-nProbe cells by
    // (csim DESC, cid ASC); the ADC tables ride along on the probe rows
    val probes = q.select(col("vec_id").as("qid"),
      pqTabs(col("v"), col("nrm"), cb).as("tabs"),
      explode(transform(
        slice(array_sort(zip_with(
          cellSims(centLiteral(cents), col("v"), col("nrm")), cidArr,
          (s, c) => struct((-s).as("negsim"), c.as("cid")))), 1, nProbe),
        x => x("cid"))).as("cell"))
    val probedCells = probes.select(col("cell")).distinct().collect()
      .map(_.getLong(0)).toIndexedSeq
    val corpus = readPqAssignment(spark, path)
      .filter(col("cell").isin(probedCells: _*))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))
    corpus.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("adist", adc(col("codes"), col("tabs")))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id").as("neighbor"),
        round(col("adist"), 6).as("adist"))
      .orderBy("qid", "rnk")
  }

  /** PQ-assignment read-back — partition column restored to long, exactly
    * like [[readAssignment]]. */
  private def readPqAssignment(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/assignment")
      .select(col("vec_id"), col("codes"), col("cell").cast("long").as("cell"))

  private def emptyAdcTopK(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("qid"), col("id").as("rnk"),
      col("id").as("neighbor"), col("id").cast("double").as("adist"))

  /** PQ codebook sidecar: header `m \t ks \t dsub`, then m·ks lines
    * `j \t c \t v0,v1,...` — Double.toString round-trips exactly, and the
    * tmp+rename publish means readers never see a torn codebook. */
  private def writePqCodebookSidecar(spark: SparkSession, path: String,
      cb: PqCodebook): Unit = {
    val dst = new org.apache.hadoop.fs.Path(s"$path/pq_codebook.tsv")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/pq_codebook.tsv.tmp")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try {
      val sb = new StringBuilder
      sb.append(cb.m).append('\t').append(cb.ks).append('\t').append(cb.dsub)
        .append('\n')
      for (j <- 0 until cb.m; c <- 0 until cb.ks) {
        sb.append(j).append('\t').append(c).append('\t')
        val v = cb.cents(j)(c)
        var i = 0
        while (i < v.length) {
          if (i > 0) sb.append(',')
          sb.append(v(i)); i += 1
        }
        sb.append('\n')
      }
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"could not publish PQ codebook at $dst")
  }

  /** PQ-codebook read-back — driver-side sidecar file, zero Spark jobs. */
  def readPqCodebook(spark: SparkSession, path: String): Option[PqCodebook] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/pq_codebook.tsv")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toString("UTF-8")
    } finally in.close()
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    val Array(m, ks, dsub) = lines.head.split('\t').map(_.toInt)
    val byJc = lines.tail.map { line =>
      val Array(j, c, vs) = line.split('\t')
      (j.toInt, c.toInt) -> vs.split(',').map(_.toDouble)
    }.toMap
    Some(PqCodebook(m, ks, dsub,
      (0 until m).map(j => (0 until ks).map(c => byJc((j, c))).toIndexedSeq)))
  }

  private def pqTopKWith(e: DataFrame, cb: PqCodebook, queryPred: Column,
      k: Int): DataFrame = {
    val corpus = e.select(col("vec_id"),
      pqCodes(col("v"), col("nrm"), cb).as("codes"))
    val queries = e.filter(queryPred)
      .select(col("vec_id").as("qid"),
        pqTabs(col("v"), col("nrm"), cb).as("tabs"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("adist"), col("neighbor"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      // ADC: Σ_j tabs[j][codes[j]] — a left fold in subspace order, the
      // same sequence the oracle's list_reduce adds in (compiled)
      .withColumn("adist", adc(col("codes"), col("tabs")))
      .select(col("qid"), col("vec_id").as("neighbor"), col("adist"))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("neighbor"), round(col("adist"), 6).as("adist"))
      .orderBy("qid", "rnk")
  }
}
