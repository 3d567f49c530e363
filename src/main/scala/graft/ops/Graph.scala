package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality over a distributed edge list — the
  * link-graph quality signal (PageRank) corpus curation uses to weight
  * web sources, kept in FIXED-POINT integer arithmetic so a run is
  * bit-reproducible on any cluster and exactly replayable by any ANSI
  * SQL engine (floating-point summation is order-dependent under a
  * shuffle; integer sums are not).
  *
  * Ranks live in units of 1e-9 (`SCALE`): rank 1.0 = 1_000_000_000
  * units. One iteration is
  * `u' = (1-α)·SCALE + (αNum · Σ_in (u div outdeg)) div 100` with
  * integer (truncating) division at both division sites — the exact
  * arithmetic any replayer reproduces. Overflow headroom: total units ≈
  * |V|·SCALE, ×αNum must stay under 2^63 → safe through |V| ≈ 10^11.
  *
  * Scale shape: per iteration ONE equi-join of the edge list against the
  * current ranks (shuffle keyed by src — co-locatable by pre-bucketing
  * the edge list), one keyed aggregation (map-side partial sums), one
  * left join back to the node set for teleport-only nodes. The edge list
  * and node set are reused every iteration — cached here, checkpointed
  * in a long production run to cut lineage. Dangling nodes (no
  * out-edges) leak their damped mass (the standard simplification);
  * every node still receives teleport.
  */
object Graph {

  val SCALE: Long = 1000000000L

  /** Fixed-point PageRank over `edges(srcCol, dstCol)` (directed; pass
    * both orientations for an undirected walk). Returns
    * `(node, rank_units)` for every node appearing in the edge list.
    * `alphaNum` is the damping factor in percent (85 = the classic
    * 0.85).
    *
    * Plan (the Pregel shape): the deduplicated edge list is hash-
    * partitioned by `src` ONCE, its out-degree is joined in co-
    * partitioned (no exchange), and the combined (src, dst, d) relation
    * is cached — the big side never moves again. Each iteration
    * exchanges only the RANKS relation (|V| rows, tiny next to |E|) to
    * the edge partitioning, aggregates contributions with map-side
    * partials, and left-joins the node set (cached on the same node
    * hash, so that join is exchange-free too). A periodic
    * `localCheckpoint` (every `checkpointInterval` iterations) truncates
    * the growing lineage — each checkpoint is a real job, so the
    * interval trades scheduling round-trips against plan depth,
    * optimizer time, and recovery cost on long runs.
    *
    * Rank-relation strategy: the default is the SHUFFLE path — the
    * placed-and-sorted cached edges never move, each iteration pays one
    * tiny in-cluster exchange of the |V|-row ranks, and the whole fixed
    * point chains without driver round trips. The broadcast path looks
    * cheaper on paper (no rank exchange, no edge-side sort) but each
    * iteration's broadcast BUILD is a synchronous driver-side collect
    * job — exactly the barrier a fixed-point loop must not stack
    * (r14 PrAB, interleaved min-of-5 at |V| = 21k: shuffle 4.41 s vs
    * broadcast 5.57 s — the side r13's one-off probe called backwards;
    * at larger |V| the gap only widens, and above autoBroadcast scale
    * broadcast is wrong outright). `broadcastRanks = Some(true)` keeps
    * the broadcast path available for the genuine one-shot case:
    * few iterations over an UNPLACED edge relation, where skipping the
    * one-time placement shuffle outweighs the per-iteration builds.
    * `broadcastMaxNodes` still bounds the auto rule if raised. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, alphaNum: Long = 85L,
      broadcastRanks: Option[Boolean] = None,
      checkpointInterval: Int = 4,
      broadcastMaxNodes: Long = 0L,
      pin: String = "checkpoint"): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    require(alphaNum > 0 && alphaNum < 100, "alphaNum is a percentage")
    require(pin == "cache" || pin == "checkpoint",
      s"pin must be cache|checkpoint, got $pin")
    // pin strategy for the fused relation (r18 A/B, Pr18AB — VERDICT
    // r17 #3, the q214 read-side convention ported): "checkpoint"
    // materializes the placed relation EAGERLY as row-form local
    // partitions, preserving the captured placement/ordering, and the
    // iterations stream against those blocks; "cache" fills the
    // columnar InMemoryRelation lazily under iteration 1 and pays the
    // columnar encode + per-iteration decode. Interleaved min-of-5 at
    // sf0.1, twice: checkpoint 3.21/3.53 s vs cache 6.15/6.23 s —
    // checkpoint is the default. (localCheckpoint partitions are
    // executor-local and non-recoverable, but the walk already pins
    // ranks/out the same way — an executor loss rewinds the query
    // either way, acceptable for an in-session one-shot; the durable
    // path q105 has no such dependency.)
    def pinned(df: DataFrame): DataFrame =
      if (pin == "checkpoint") df.localCheckpoint() else df.cache()
    val teleport = (100L - alphaNum) * SCALE / 100L
    val degERaw = edgeRelation(edges, srcCol, dstCol)
    // ONE cached materialization (r10 had three — e, nodes, degE — plus
    // an unconditional eager count; the fused relation subsumes all of
    // them: real edges carry their degree, sentinel rows ARE the node
    // set). Strategy + materialization per case:
    //  - forced side: build directly in the right shape, ZERO extra jobs
    //    (the cache fills lazily under iteration 1);
    //  - auto: cache the shape-neutral relation and read |V| off its
    //    sentinel rows — the SAME job that fills the cache, so the
    //    estimate is free; only a genuinely large graph (> maxNodes)
    //    pays a re-shape, from the cache, never from source.
    var degE: DataFrame = null
    var useBroadcast = false
    broadcastRanks match {
      case Some(b) =>
        useBroadcast = chooseRankStrategy(0L, broadcastMaxNodes, broadcastRanks)
        degE = pinned(if (b) degERaw else placedBySrc(degERaw))
      case None if broadcastMaxNodes <= 0L =>
        // auto with a zero cutover can never pick broadcast — skip the
        // |V| estimation job and build the placed layout directly
        useBroadcast = false
        degE = pinned(placedBySrc(degERaw))
      case None =>
        val degE0 = degERaw.cache()
        val nV = degE0.filter(col("d") === Long.MaxValue).count()
        useBroadcast = chooseRankStrategy(nV, broadcastMaxNodes, broadcastRanks)
        if (useBroadcast) degE = degE0
        else {
          // InMemoryRelation keeps its child's outputOrdering, so each
          // iteration sorts only the arriving |V|-row ranks side,
          // never the edges
          degE = placedBySrc(degE0).cache()
          degE.count() // fill from degE0 BEFORE dropping it
          degE0.unpersist()
        }
    }
    val nodes = degE.filter(col("d") === Long.MaxValue)
      .select(col("src").as("node"))
    var ranks = nodes.withColumn("u", lit(SCALE))
    for (i <- 1 to iterations) {
      val ranksSrc = ranks.withColumnRenamed("node", "src")
      val contribs = degE
        .join(if (useBroadcast) broadcast(ranksSrc) else ranksSrc, "src")
        .select(col("dst").as("node"), expr("u div d").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      ranks = contribs.select(col("node"),
        (lit(teleport) + expr(s"($alphaNum * c) div 100")).as("u"))
      // materialize only every few iterations: each checkpoint is a real
      // job, so checkpointing every step pays one scheduling+materialize
      // round trip per iteration; unchecked lineage instead folds the
      // whole chain into ONE job (cached degE is scanned per iteration
      // either way). The interval only bounds plan depth / optimizer
      // time / recovery cost on long runs — EXCEPT on the broadcast
      // path, where every iteration's broadcast build re-executes the
      // chain since the last materialization; there a short interval is
      // the difference between linear and quadratic re-execution.
      if (i % checkpointInterval == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    // materialize the final ranks (one eager localCheckpoint), then drop
    // the three cached relations: returning them lazily would pin edge-
    // scale executor storage until LRU eviction across repeated calls in
    // one session (bench reps), and unpersisting without materializing
    // would silently recompute the whole iteration chain from scratch at
    // first use. The checkpoint blocks free themselves when the returned
    // plan is GC'd.
    val out = ranks.select(col("node"), col("u").as("rank_units")).localCheckpoint()
    degE.unpersist()
    out
  }

  /** The fused edge relation both entry points share: deduplicated
    * (src, dst) pairs carrying their out-degree `d`, PLUS one
    * zero-contribution sentinel row per node (src = dst = node,
    * d = Long.MaxValue so `u div d = 0`). Every node then appears both
    * as a src (the inner join against ranks keeps it alive) and as a
    * dst (the aggregation emits its rank even with no real in-edges) —
    * no per-iteration left join against a node set, and the node set
    * itself is recoverable as `d = Long.MaxValue` (no second relation).
    *
    * ONE shuffle for dedup + placement: hash(src) co-locates equal
    * (src, dst) pairs, and HashPartitioning(src) satisfies the dedup
    * aggregation's ClusteredDistribution(src, dst), so dropDuplicates,
    * the degree aggregation, AND the node-distinct all run on the same
    * exchange — Catalyst reuses it across the three consumers
    * (ReusedExchange) within the one materialization job. */
  private def edgeRelation(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    // ONE exchange for dedup + degree + node set (r19, VERDICT r18 #4 —
    // the r18 shape paid a SECOND 2|E| exchange for the node-set
    // distinct): edge rows route by src and a narrow dst-endpoint MARKER
    // row routes by dst through the same hash(k) exchange, so the
    // (k, dst, m) dedup, the per-src degree, the node distinct (every
    // endpoint appears as a k — srcs via their edge rows, dsts via their
    // markers), and the degree join all satisfy their distributions on
    // that single exchange (AliasAware partitioning propagation keeps it
    // through the renames).
    val raw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val dstType = raw.schema("dst").dataType
    val tagged = raw.select(col("src").as("k"), col("dst"), lit(false).as("m"))
      .unionAll(raw.select(col("dst").as("k"),
        lit(null).cast(dstType).as("dst"), lit(true).as("m")))
    val dedup = tagged.repartition(col("k")).dropDuplicates("k", "dst", "m")
    val e = dedup.filter(!col("m"))
      .select(col("k").as("src"), col("dst"))
    val nodes = dedup.select(col("k").as("node")).distinct()
    e.join(e.groupBy("src").agg(count(lit(1)).as("d")), "src")
      .unionAll(nodes.select(col("node").as("src"), col("node").as("dst"),
        lit(Long.MaxValue).as("d")))
  }

  /** Re-place the fused relation by src and sort within partitions —
    * the build-once layout the SMJ iteration path streams against. */
  private[graft] def placedBySrc(degERaw: DataFrame): DataFrame =
    degERaw.repartition(col("src")).sortWithinPartitions(col("src"))

  /** Write the fused edge relation ONCE as a bucketed, bucket-sorted
    * lake table (the docstring's promised durable variant): dedup,
    * out-degree, and node sentinels are all prepaid at build time, and
    * the table is bucketed by `src` with one file per bucket, so
    * [[pageRankFromIndex]] serves iterations with ZERO build shuffles —
    * the placed table never moves; only ranks do. The pre-repartition
    * into exactly `buckets` tasks uses the same murmur3 hash family as
    * the bucket-id assignment, so each task holds exactly one bucket's
    * rows → one file per bucket → the scan advertises its sort order
    * and the per-iteration SMJ never re-sorts the edge side.
    *
    * This is the 100 TB shape: the in-memory [[pageRank]] caches the
    * placed relation (right while it fits executor storage); the index
    * variant streams it from the lake each iteration — disk-backed,
    * no cache pressure, and the build cost amortizes across every
    * later run exactly like the ANN/shingle indexes (q56–q61). */
  def writeEdgeIndex(edges: DataFrame, srcCol: String, dstCol: String,
      tableName: String, buckets: Int): Unit = {
    val degERaw = edgeRelation(edges, srcCol, dstCol)
    graft.io.Lake.writeBucketed(degERaw.repartition(buckets, col("src")),
      tableName, "src", buckets, Some("src"))
  }

  /** [[pageRank]] served from a [[writeEdgeIndex]] table: identical
    * arithmetic and results (spec-asserted bit-equal), but the edge
    * side of every iteration is the placed bucketed scan — no dedup,
    * no degree aggregation, no node-set derivation, no exchange on the
    * edge side ever (PlanAudit-asserted: the only shuffle per
    * iteration moves the |V|-row rank relation).
    *
    * Checkpoint cadence (r14, Q105Probe-measured): unlike the in-memory
    * broadcast path, the lake-served shuffle path re-executes NOTHING
    * per iteration (SMJ against the placed scan — no broadcast builds
    * replaying the chain), so a pin buys only bounded plan depth on
    * LONG runs and costs a full materialization job round-trip. The
    * default interval 8 lets the common short fixed point (5
    * iterations) run as ONE fully-chained job — measured 1.5 s vs
    * 1.9 s with a pin at 4 — while a 50-iteration run still pins. */
  def pageRankFromIndex(spark: org.apache.spark.sql.SparkSession,
      tableName: String, iterations: Int, alphaNum: Long = 85L,
      checkpointInterval: Int = 8): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    require(alphaNum > 0 && alphaNum < 100, "alphaNum is a percentage")
    val teleport = (100L - alphaNum) * SCALE / 100L
    val degE = spark.table(tableName)
    var ranks = degE.filter(col("d") === Long.MaxValue)
      .select(col("src").as("node")).withColumn("u", lit(SCALE))
    for (i <- 1 to iterations) {
      val ranksSrc = ranks.withColumnRenamed("node", "src")
      val contribs = degE.join(ranksSrc, "src")
        .select(col("dst").as("node"), expr("u div d").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      ranks = contribs.select(col("node"),
        (lit(teleport) + expr(s"($alphaNum * c) div 100")).as("u"))
      if (i % checkpointInterval == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("u").as("rank_units"))
  }

  /** PERSONALIZED PageRank served from a [[writeEdgeIndex]] table — the
    * random walk restarts only at SEED nodes (Haveliwala's topic-
    * sensitive PageRank; the "importance relative to these sources"
    * signal: domain whitelists seeding quality propagation, a user's
    * items seeding recommendations). A one-term generalization of
    * [[pageRankFromIndex]] reusing the whole fixed-point harness: the
    * teleport summand becomes `seed(node) ? (1−α)·SCALE : 0` and the
    * initial vector `seed(node) ? SCALE : 0` — the edge side stays the
    * placed bucketed scan with zero per-iteration exchanges, the rank
    * relation stays the only moving part, and the arithmetic stays
    * integer 1e-9 units (bit-reproducible, SQL-replayable).
    *
    * `seed` must be a deterministic predicate OF THE NODE ID (evaluated
    * in-row on both the init and update sides — no seed-set join, no
    * broadcast), which is exactly what keeps the oracle expressible:
    * the replayer writes the same CASE over its node column. Non-seed
    * nodes unreachable from any seed report rank 0 — kept, not
    * filtered, so the output is the full fixed-point vector. */
  def personalizedPageRankFromIndex(spark: org.apache.spark.sql.SparkSession,
      tableName: String, iterations: Int, seed: org.apache.spark.sql.Column
        => org.apache.spark.sql.Column, alphaNum: Long = 85L,
      checkpointInterval: Int = 8): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    require(alphaNum > 0 && alphaNum < 100, "alphaNum is a percentage")
    val teleport = (100L - alphaNum) * SCALE / 100L
    val degE = spark.table(tableName)
    var ranks = degE.filter(col("d") === Long.MaxValue)
      .select(col("src").as("node"))
      .withColumn("u", when(seed(col("node")), lit(SCALE)).otherwise(lit(0L)))
    for (i <- 1 to iterations) {
      val ranksSrc = ranks.withColumnRenamed("node", "src")
      val contribs = degE.join(ranksSrc, "src")
        .select(col("dst").as("node"), expr("u div d").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      ranks = contribs.select(col("node"),
        (when(seed(col("node")), lit(teleport)).otherwise(lit(0L)) +
          expr(s"($alphaNum * c) div 100")).as("u"))
      if (i % checkpointInterval == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("u").as("rank_units"))
  }

  /** WEIGHTED edge index — [[writeEdgeIndex]] for a walk that follows
    * an out-edge with probability w/Σw instead of 1/outdeg (the
    * link-graph reality: a source that links a domain 40 times should
    * pass it more mass than one that links it once). Each (src, dst)
    * edge carries a BIGINT weight (duplicate edges pre-summed at build
    * time — the multigraph collapses to its weight), and the relation
    * stores the per-src total `sw` alongside, so serving needs no
    * degree/total aggregation — one expression change on the placed
    * scan. Node sentinels keep every node in the rank vector with
    * (w = 0, sw = Long.MaxValue): they contribute 0 mass exactly like
    * the unweighted index's d = MaxValue rows. Layout identical to the
    * unweighted index: bucketed and bucket-sorted by src, one file per
    * bucket, zero edge-side exchanges per iteration.
    *
    * Overflow bound — ENFORCED AT BUILD, not documented away: the
    * serve-time update computes u·w before the divide and then
    * alphaNum·Σ_in(u·w div sw); with mass conservation u never exceeds
    * total mass |V|·SCALE, so every intermediate is bounded by
    * max(w_max, 100) · |V| · SCALE. The build aggregates max(w) and
    * |V| (one metadata-sized pass over the relation it is writing
    * anyway) and REFUSES to write an index whose bound can wrap 2^63 —
    * silent wraparound would hash-diverge only on data big enough that
    * no oracle catches it (e.g. w up to ~10^5 is safe on a 10^6-node
    * graph; lineitem counts are single digits). Negative weights are
    * rejected outright (they break both the probability semantics and
    * the bound analysis). */
  def writeWeightedEdgeIndex(edges: DataFrame, srcCol: String,
      dstCol: String, wCol: String, tableName: String, buckets: Int): Unit = {
    // EAGER checkpoint: stats pass + bucketed write share one compute,
    // AND [[appendToWeightedEdgeIndex]] depends on the materialization
    // happening BEFORE writeBucketed drops the table its input reads —
    // do not make this lazy
    val rel = buildWeightedRelation(edges.select(col(srcCol).as("src"),
        col(dstCol).as("dst"), col(wCol).cast("long").as("w")))
      .localCheckpoint()
    val st = weightedStats(rel)
    st.foreach { case (maxW, minW, nv) =>
      requireWeightedBoundStats(maxW, minW, nv) }
    graft.io.Lake.writeBucketed(rel.repartition(buckets, col("src")),
      tableName, "src", buckets, Some("src"))
    // persist the envelope so appends re-check it O(touched), not O(index)
    val (maxW, nv) = st.map(s => (s._1, s._3)).getOrElse((0L, 0L))
    setBoundProps(edges.sparkSession, tableName, maxW, nv)
  }

  /** The fused weighted relation from raw (src, dst, w) edges:
    * duplicates pre-summed, per-src totals alongside, node sentinels
    * (w = 0, sw = MaxValue) keeping every endpoint in the rank vector.
    * Shared by the index build and the streaming read-side merge
    * ([[graft.streaming.StreamSink.readWeightedPageRank]]). */
  private[graft] def buildWeightedRelation(edges: DataFrame): DataFrame = {
    val e = edges.repartition(col("src"))
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    e.join(e.groupBy("src").agg(sum(col("w")).as("sw")), "src")
      .unionAll(nodes.select(col("node").as("src"), col("node").as("dst"),
        lit(0L).as("w"), lit(Long.MaxValue).as("sw")))
  }

  /** The build/read-time overflow gate: one metadata-sized aggregation
    * over an already-materialized relation; REFUSES relations whose
    * max(w)·|V|·SCALE envelope can wrap 2^63 and rejects negative
    * weights. Shared by every path that hands a weighted relation to
    * the fixed-point walk. */
  /** (max w, min w, |V|) of a prepared weighted relation in ONE 1-row
    * aggregation pass. |V| = the sentinel count: buildWeightedRelation
    * emits exactly one (w=0, sw=MaxValue) sentinel per node, so counting
    * them equals the old countDistinct(src) — WITHOUT the distinct's
    * shuffle (r19). None for an empty relation. */
  private[graft] def weightedStats(rel: DataFrame): Option[(Long, Long, Long)] = {
    val st = rel.agg(max(col("w")).as("maxW"), min(col("w")).as("minW"),
      sum(when(col("sw") === Long.MaxValue, 1L).otherwise(0L)).as("nv")).head()
    if (st.isNullAt(0)) None
    else Some((st.getLong(0), st.getLong(1), st.getLong(2)))
  }

  /** The 2^63 fixed-point envelope on already-computed stats. */
  private[graft] def requireWeightedBoundStats(maxW: Long, minW: Long,
      nv: Long): Unit = {
    require(minW >= 0L,
      s"writeWeightedEdgeIndex: negative edge weight $minW — weights are walk probabilities")
    val bound = BigInt(maxW).max(BigInt(100)) * BigInt(nv) * BigInt(SCALE)
    require(bound < BigInt(2).pow(63),
      s"writeWeightedEdgeIndex: max(w)=$maxW on a $nv-node graph can " +
        s"overflow the 64-bit fixed-point update (bound $bound >= 2^63); " +
        "rescale the weights (only w/sw ratios matter to the walk)")
  }

  private[graft] def requireWeightedBound(rel: DataFrame): Unit =
    weightedStats(rel).foreach { case (maxW, minW, nv) =>
      requireWeightedBoundStats(maxW, minW, nv) }

  /** The stored (max w, |V|) envelope of a weighted-edge index table,
    * kept as table properties so an append can re-check the overflow
    * bound WITHOUT an O(index) stats scan: new max(w) is exactly
    * max(stored, staged) — weights only ever grow, so the old global max
    * never disappears — and new |V| is stored − (touched buckets' old
    * sentinels) + (staged sentinels). Absent on pre-r19 indexes, where
    * the append falls back to the full-content stats pass. */
  private val propMaxW = "graft.wbound.maxw"
  private val propNv = "graft.wbound.nv"
  private def boundProps(spark: org.apache.spark.sql.SparkSession,
      tableName: String): Option[(Long, Long)] = {
    val p = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName)).properties
    for (m <- p.get(propMaxW); n <- p.get(propNv)) yield (m.toLong, n.toLong)
  }
  private def setBoundProps(spark: org.apache.spark.sql.SparkSession,
      tableName: String, maxW: Long, nv: Long): Unit =
    spark.sql(s"ALTER TABLE `$tableName` SET TBLPROPERTIES " +
      s"('$propMaxW' = '$maxW', '$propNv' = '$nv')")

  /** Incremental maintenance for [[writeWeightedEdgeIndex]] — the
    * [[graft.ops.Recs.appendToCoVisitIndex]] convention on the graph
    * family: edge weights are ADDITIVE (the multigraph's multiplicity
    * is a count), so merging a batch of new edges is a pure re-sum —
    * stored per-(src,dst) weights union the batch's aggregates, per-src
    * totals and node sentinels re-derive from the merged edge set, and
    * the result is BIT-IDENTICAL to a from-scratch
    * [[writeWeightedEdgeIndex]] over old∪new edges BY CONSTRUCTION
    * (rebuild-over-union ≡ merge for distributive sums; GraphSpec
    * asserts it row-for-row including sw and sentinels). The overflow
    * bound re-checks on every append — a batch that pushes max(w)·|V|
    * past the 2^63 envelope REFUSES, it cannot silently wrap.
    *
    * The stored edge rows are already per-(src,dst) summed, so the
    * merge aggregation runs over |index| + |batch| rows, never the raw
    * edge log. The publish is the swap-rewrite convention (read side
    * materialized via the write path's localCheckpoint before the
    * table it reads is dropped); at lake scale only the buckets
    * holding touched srcs need rewriting — the same note
    * [[graft.ops.Similarity.appendToBeamGraphIndex]] carries.
    *
    * Unlike the unweighted [[writeEdgeIndex]] (whose dedup makes a
    * re-sent edge invisible), re-sending an edge here ADDS weight —
    * that is the multigraph semantics, not a bug, but it makes the
    * exactly-once contract the caller's: a batch must not replay.
    *
    * Crash-recovery contract (ADVICE r17): when `into == tableName` the
    * publish is an IN-PLACE swap whose durability leg is localCheckpoint
    * — eager, but executor-local and non-recoverable. An executor loss
    * (or process death) after writeBucketed's drop and before its
    * rewrite completes loses the durable index mid-append; the recovery
    * path is a rebuild from the raw edge log
    * ([[writeWeightedEdgeIndex]] over everything ever admitted — edge
    * weights are distributive sums, so the rebuild is exact). Pass a
    * DIFFERENT `into` to publish the merge as a new table instead: the
    * old index is then never dropped and the append is trivially
    * crash-safe (the fold-into-base compaction uses this).
    *
    * @param into target table for the merged index; defaults to an
    *             in-place swap of `tableName` */
  def appendToWeightedEdgeIndex(newEdges: DataFrame, srcCol: String,
      dstCol: String, wCol: String, tableName: String, buckets: Int,
      into: String = ""): Unit = {
    val spark = newEdges.sparkSession
    val target = if (into.isEmpty) tableName else into
    // BUCKET-LEVEL merge (guide §6; VERDICT r18 #1 — the "at lake scale
    // only the buckets holding touched srcs need rewriting" note, now
    // implemented): the batch collapses to per-(src, dst) delta sums
    // (the only pass over the raw edge log), the delta's ENDPOINT
    // buckets name the touched set (dst buckets too — a new node's
    // sentinel lives in ITS bucket, not its edge's), and only those
    // buckets re-merge and republish. Within the touched buckets the
    // merge reproduces buildWeightedRelation EXACTLY: edges re-sum per
    // (src, dst), per-src totals re-derive (every edge of a src lives
    // in that src's bucket, so the bucket-local sum IS sw), sentinels =
    // the bucket's existing sentinels ∪ the delta's new endpoints —
    // bit-identical to a from-scratch rebuild over old∪new (GraphSpec's
    // append≡rebuild property runs against this path unchanged).
    // Plan shape: ONE exchange places base-touched∪delta into the
    // bucket partitioning; the (src,dst) re-sum, the per-src totals,
    // and the totals join all run on that placement exchange-free; one
    // more exchange places the final union (sentinels included). The
    // old path re-aggregated and re-wrote the WHOLE index through ~4
    // exchanges + a full localCheckpoint materialization.
    val delta = newEdges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .localCheckpoint() // small; reused by 3 consumers + the touched listing
    val touched = delta.select(explode(array(
        graft.io.Lake.bucketIdColumn(col("src"), buckets),
        graft.io.Lake.bucketIdColumn(col("dst"), buckets))).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val baseTouched = graft.io.Lake.readBuckets(spark, tableName, touched)
    val baseEdges = baseTouched.filter(col("sw") =!= Long.MaxValue)
      .select(col("src"), col("dst"), col("w"))
    val baseSent = baseTouched.filter(col("sw") === Long.MaxValue)
      .select(col("src").as("node"))
    val e = baseEdges.unionByName(delta)
      .repartition(buckets, col("src"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val edgeRows = e.join(e.groupBy(col("src")).agg(sum(col("w")).as("sw")),
        "src")
      .select(col("src"), col("dst"), col("w"), col("sw"))
    val deltaNodes = delta
      .select(explode(array(col("src"), col("dst"))).as("node")).distinct()
    val newSent = deltaNodes.join(baseSent, Seq("node"), "left_anti")
    val sentRows = baseSent.unionByName(newSent)
      .select(col("node").as("src"), col("node").as("dst"),
        lit(0L).as("w"), lit(Long.MaxValue).as("sw"))
    val merged = edgeRows.unionByName(sentRows)
      .repartition(buckets, col("src"))
    // the overflow bound re-checks BEFORE any base file moves (a refusing
    // append leaves the old index fully intact, where the old
    // full-rewrite publish refused only after materializing the whole
    // merge) — and O(touched): with the stored (max w, |V|) envelope the
    // new stats derive from the STAGED buckets alone (weights only grow,
    // so max(stored, staged) is the exact new max; |V| = stored − the
    // touched buckets' old sentinels + the staged ones). A pre-r19 index
    // without stored props falls back to the full-content stats pass
    // once; either way the target carries props afterwards.
    var newProps: Option[(Long, Long)] = None
    val check: (DataFrame, DataFrame) => Unit =
      boundProps(spark, tableName) match {
        case Some((bMax, bNv)) => (staged, _) =>
          weightedStats(staged) match {
            case Some((sMax, sMin, sSent)) =>
              val baseSentTouched = baseSent.count()
              val maxW = math.max(bMax, sMax)
              val nv = bNv - baseSentTouched + sSent
              requireWeightedBoundStats(maxW, sMin, nv)
              newProps = Some((maxW, nv))
            case None => newProps = Some((bMax, bNv)) // empty delta
          }
        case None => (staged, untouched) => {
          val st = weightedStats(staged.unionByName(untouched))
          st.foreach { case (maxW, minW, nv) =>
            requireWeightedBoundStats(maxW, minW, nv) }
          newProps = st.map(s => (s._1, s._3))
        }
      }
    graft.io.Lake.rewriteBuckets(spark, tableName, target, merged, touched,
      "src", buckets, Some("src"), check = check)
    val (maxW, nv) = newProps.getOrElse((0L, 0L))
    setBoundProps(spark, target, maxW, nv)
  }

  /** [[pageRankFromIndex]] over a [[writeWeightedEdgeIndex]] table: the
    * contribution expression becomes `(u·w) div sw` — everything else
    * (fixed-point harness, integer units, checkpoint cadence, one
    * |V|-row rank exchange per iteration) is shared unchanged, and the
    * arithmetic stays exactly SQL-replayable
    * ([[weightedPageRankOracleSql]]). With all weights equal the ranks
    * are BIT-IDENTICAL to the unweighted walk (floor(u·c/(c·d)) =
    * floor(u/d) for nonnegative integers — spec-asserted), so the
    * unweighted family is the w≡1 member of this one. */
  def weightedPageRankFromIndex(spark: org.apache.spark.sql.SparkSession,
      tableName: String, iterations: Int, alphaNum: Long = 85L,
      checkpointInterval: Int = 8): DataFrame =
    weightedPageRankOverRelation(spark.table(tableName), iterations,
      alphaNum, checkpointInterval)

  /** The fixed-point walk over ANY prepared weighted relation (the
    * [[buildWeightedRelation]] shape) — the placed bucketed table is
    * the durable caller; the streaming read-side merge hands in its
    * localCheckpointed base∪landings relation. */
  private[graft] def weightedPageRankOverRelation(wE: DataFrame,
      iterations: Int, alphaNum: Long = 85L,
      checkpointInterval: Int = 8): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    require(alphaNum > 0 && alphaNum < 100, "alphaNum is a percentage")
    val teleport = (100L - alphaNum) * SCALE / 100L
    var ranks = wE.filter(col("sw") === Long.MaxValue)
      .select(col("src").as("node")).withColumn("u", lit(SCALE))
    for (i <- 1 to iterations) {
      val ranksSrc = ranks.withColumnRenamed("node", "src")
      val contribs = wE.join(ranksSrc, "src")
        .select(col("dst").as("node"), expr("(u * w) div sw").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      ranks = contribs.select(col("node"),
        (lit(teleport) + expr(s"($alphaNum * c) div 100")).as("u"))
      if (i % checkpointInterval == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("u").as("rank_units"))
  }

  /** The unrolled replay of [[weightedPageRankFromIndex]]: `edgesSql`
    * must produce (src, dst, w) with duplicate edges already summed —
    * the build-time aggregation [[writeWeightedEdgeIndex]] prepays. */
  def weightedPageRankOracleSql(edgesSql: String, iterations: Int,
      alphaNum: Long = 85L): String = {
    val teleport = (100L - alphaNum) * SCALE / 100L
    val iters = (1 to iterations).map { i =>
      s"r$i AS (SELECT n.node, CAST($teleport + ($alphaNum * coalesce(s.c, 0)) // 100 AS BIGINT) AS u " +
        s"FROM n LEFT JOIN (SELECT e.dst AS node, sum((r${i - 1}.u * e.w) // sw.sw) AS c " +
        s"FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node JOIN sw ON sw.src = e.src " +
        "GROUP BY e.dst) s ON n.node = s.node)"
    }.mkString(", ")
    s"WITH e AS ($edgesSql), " +
      "sw AS (SELECT src, sum(w) AS sw FROM e GROUP BY src), " +
      "n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)), " +
      s"r0 AS (SELECT node, CAST($SCALE AS BIGINT) AS u FROM n), " +
      iters +
      s" SELECT node, u AS rank_units FROM r$iterations"
  }

  /** The broadcast-vs-shuffle decision, separated so the boundary is
    * unit-testable: broadcast iff |V| ≤ maxNodes, unless forced. */
  private[graft] def chooseRankStrategy(nV: Long, maxNodes: Long,
      forced: Option[Boolean]): Boolean =
    forced.getOrElse(nV <= maxNodes)

  /** The unrolled-iteration ANSI SQL replay of [[pageRank]] for a
    * DuckDB oracle: identical integer arithmetic, one chained CTE per
    * iteration (recursive CTEs can't aggregate in the recursive term).
    * `edgesSql` must produce columns (src, dst), already deduplicated
    * and bidirectional if the walk is undirected. */
  def pageRankOracleSql(edgesSql: String, iterations: Int,
      alphaNum: Long = 85L): String = {
    val teleport = (100L - alphaNum) * SCALE / 100L
    val iters = (1 to iterations).map { i =>
      s"r$i AS (SELECT n.node, CAST($teleport + ($alphaNum * coalesce(s.c, 0)) // 100 AS BIGINT) AS u " +
        s"FROM n LEFT JOIN (SELECT e.dst AS node, sum(r${i - 1}.u // deg.d) AS c " +
        s"FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node JOIN deg ON deg.src = e.src " +
        "GROUP BY e.dst) s ON n.node = s.node)"
    }.mkString(", ")
    s"WITH e AS ($edgesSql), " +
      "deg AS (SELECT src, count(*) AS d FROM e GROUP BY src), " +
      "n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)), " +
      s"r0 AS (SELECT node, CAST($SCALE AS BIGINT) AS u FROM n), " +
      iters +
      s" SELECT node, u AS rank_units FROM r$iterations"
  }

  /** The unrolled replay of [[personalizedPageRankFromIndex]]: identical
    * to [[pageRankOracleSql]] except the teleport summand and the
    * initial vector carry the seed CASE. `seedSql` is a SQL boolean
    * over the column `node` (e.g. `"node % 50 = 0"`). */
  def personalizedPageRankOracleSql(edgesSql: String, iterations: Int,
      seedSql: String, alphaNum: Long = 85L): String = {
    val teleport = (100L - alphaNum) * SCALE / 100L
    def tele(of: String) =
      s"CASE WHEN ${seedSql.replace("node", of)} THEN $teleport ELSE 0 END"
    val iters = (1 to iterations).map { i =>
      s"r$i AS (SELECT n.node, CAST(${tele("n.node")} + " +
        s"($alphaNum * coalesce(s.c, 0)) // 100 AS BIGINT) AS u " +
        s"FROM n LEFT JOIN (SELECT e.dst AS node, sum(r${i - 1}.u // deg.d) AS c " +
        s"FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node JOIN deg ON deg.src = e.src " +
        "GROUP BY e.dst) s ON n.node = s.node)"
    }.mkString(", ")
    s"WITH e AS ($edgesSql), " +
      "deg AS (SELECT src, count(*) AS d FROM e GROUP BY src), " +
      "n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)), " +
      s"r0 AS (SELECT node, CAST(CASE WHEN $seedSql THEN $SCALE ELSE 0 END " +
      "AS BIGINT) AS u FROM n), " +
      iters +
      s" SELECT node, u AS rank_units FROM r$iterations"
  }

  /** Per-node triangle counts over an undirected simple graph — the
    * local-clustering numerator (community/spam structure signal; a
    * node in t triangles has clustering coefficient 2t/(d·(d−1))).
    *
    * The naive 3-way self-join fans out on hub nodes (a degree-d node
    * contributes d² wedges — the "curse of the last reducer", Suri &
    * Vassilvitskii WWW'11). This is the degree-ORDERED orientation that
    * bounds it: orient every undirected edge from its (degree, id)-
    * smaller endpoint to the larger, so every node's OUT-degree is
    * ≤ O(√|E|) regardless of its real degree, wedges are out-neighbor
    * pairs of the oriented graph (each triangle generates exactly one:
    * at its order-minimal vertex), and a wedge closes iff the oriented
    * edge between its endpoints exists — an equi-join, never a cross
    * product. All joins are equi-joins on node keys; the wedge
    * generation is a self-join of the oriented edges on their source,
    * with the quadratic term capped by the orientation bound.
    *
    * Returns `(node, tri_cnt)` for every node in ≥ 1 triangle. Input
    * edges may be directed/duplicated/self-looped — canonicalized here
    * (undirected, simple). */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull
        && col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient by the (degree, id) total order; carry the target's order
    // key so wedge pairs can be ordered the SAME way without a rejoin
    val uLess = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // materialize once: the oriented relation feeds THREE consumers
    // (both wedge sides + the closing join); without the cut each
    // re-derives canonicalize+degree+orientation from source
    val oriented = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(uLess, col("u")).otherwise(col("v")).as("s"),
        when(uLess, col("v")).otherwise(col("u")).as("t"),
        when(uLess, col("dv")).otherwise(col("du")).as("dt"))
      .localCheckpoint()
    // wedges: ordered out-neighbor pairs sharing source a; close each
    // against the oriented edge (b, c)
    val o1 = oriented.select(col("s").as("a"), col("t").as("b"), col("dt").as("db"))
    val o2 = oriented.select(col("s").as("a"), col("t").as("c"), col("dt").as("dc"))
    val wedges = o1.join(o2, Seq("a"))
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
    val tris = wedges.join(
      oriented.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt"))
  }
}
