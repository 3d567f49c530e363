package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * splitting, per-group balanced downsampling, and token-budget packing.
  *
  * Everything here is a pure function of the row's key — no `rand()`, no
  * monotonically_increasing_id — so assignments are reproducible across
  * runs, stable under repartitioning, and replayable by the SQL oracle.
  * The hash is a Knuth-style multiplicative mix in plain 64-bit integer
  * arithmetic (products stay < 2^63 for ids < ~3.5e9; document ids are
  * dataset-ordinal, far below that), NOT xxhash64, precisely so the same
  * expression runs in any ANSI SQL engine.
  *
  * Scale notes:
  *  - [[assignSplit]] is a stateless projection — embarrassingly parallel.
  *  - [[balancedSample]] is one window shuffle on the group key; group
  *    cardinality (lang, source, …) is the partition count, and the
  *    per-group `keep` bound caps every partition's output.
  *  - [[packBins]] deliberately packs WITHIN a shard column: a global
  *    running token sum would order the whole corpus through one
  *    partition (the classic non-scalable window). Real pipelines pack
  *    per shard/file anyway — cross-shard bins don't exist on disk.
  */
object Curation {

  /** Deterministic hash of an id into [0, 2^32): Knuth multiplicative
    * mixing, replayable as
    * `(((id % 2147483648) * 2654435761 + 2654435769) % 4294967296)` in
    * any SQL (for the non-negative ids real corpora carry — see below).
    * The id is reduced mod 2^31 BEFORE the multiply so the product peaks
    * at ~5.7·10^18 < 2^63 — no silent 64-bit wrap for any long id (an
    * unreduced multiply overflows, biasedly, from id ≈ 3.5·10^9, which a
    * 100 TB corpus can reach). The reduction is `pmod`, so a NEGATIVE id
    * also lands in [0, 2^31) and hashes uniformly — with plain `%` its
    * negative remainder made every downstream bucket comparison
    * (`bucket < trainPct`) silently true, routing all negative-id docs
    * to 'train'. Ids outside [0, 2^31) alias with their low 31 bits —
    * harmless for split/sample uniformity; order ties are always broken
    * by the full id. */
  def idHash(id: Column): Column =
    (pmod(id, lit(2147483648L)) * lit(2654435761L) + lit(2654435769L)) % lit(4294967296L)

  /** Stable train/val/test assignment: bucket = idHash(id) % 100, then
    * `[0, trainPct) → train`, `[trainPct, trainPct+valPct) → val`,
    * rest → test. Being hash-of-id (not row position), the split is
    * stable under re-ingestion, shuffling, and corpus growth — a doc
    * never migrates between splits when neighbors are added/removed. */
  def assignSplit(df: DataFrame, idCol: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages train=$trainPct val=$valPct")
    val bucket = idHash(col(idCol)) % lit(100)
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Near-dup-aware train/val/test split — the leakage guard
    * [[assignSplit]] alone cannot give: a near-duplicate of a test
    * document must not land in train (it would leak the evaluation
    * set into training), so every connected component of the near-dup
    * pair graph is routed WHOLLY into one split. The split key is the
    * component's min-id label ([[Dedup.connectedComponents]]) for
    * paired docs and the doc's own id for singletons; bucketing is the
    * same multiplicative [[idHash]] arithmetic as [[assignSplit]], so
    * singleton assignments are IDENTICAL to the plain split and the
    * whole operator is SQL-replayable (recursive-CTE components + the
    * q47 hash formula).
    *
    * Scale shape: components run over the PAIR set (≪ corpus — only
    * near-dup members appear); the label relation joins back onto the
    * corpus with the strategy left to AQE (it broadcasts while the
    * paired subset is small, the common regime); the split itself is a
    * row-local projection. Returns `docs` plus `cluster_key` (the
    * routing key) and `split`. */
  def clusterAwareSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages train=$trainPct val=$valPct")
    val comp = graft.ops.Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("lbl").as("__ck"))
    val keyed = docs.join(comp, Seq(idCol), "left")
      .withColumn("cluster_key",
        coalesce(col("__ck"), col(idCol).cast("long")))
      .drop("__ck")
    val bucket = idHash(col("cluster_key")) % lit(100)
    keyed.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Per-group balanced downsample: keep at most `keep` rows per group,
    * chosen by hash order (deterministic, unbiased by ingestion order;
    * ties broken by id). The canonical class-rebalance step before
    * training — caps dominant groups without touching rare ones. */
  def balancedSample(df: DataFrame, groupCol: String, idCol: String,
      keep: Int): DataFrame = {
    require(keep > 0, "keep must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(idHash(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= keep)
      .drop("__rn")
  }

  /** Benchmark decontamination: ids of `train` docs sharing at least one
    * `width`-word shingle with the `bench` (held-out / eval) corpus — the
    * overlap check every training pipeline runs before a benchmark can be
    * trusted. Shape: inverted-index LEFT SEMI join on the shingle — the
    * bench shingle set is distinct'd (and typically small enough that AQE
    * broadcasts it), the train side streams once, and no doc×doc
    * comparison ever exists. Callers drop contaminated docs with a
    * left_anti join on the returned ids. */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, width: Int): DataFrame = {
    graft.functions.CatalystExpressions.register(train.sparkSession)
    val shingles = graft.functions.TextFunctions.wordShingles(_: Column, width)
    val t = train.select(col(idCol),
      explode(shingles(col(textCol))).as("g"))
    val b = bench.select(explode(shingles(col(textCol))).as("g")).distinct()
    t.join(b, Seq("g"), "left_semi").select(col(idCol)).distinct()
  }

  /** Token-budget packing: within each shard (ordered by id), assign row
    * i to bin floor(prefix_tokens_before_i / budget) — the streaming
    * sequence-packing approximation every LLM batch builder uses. Bin b
    * holds the consecutive docs whose preceding-token offset falls in
    * [b·budget, (b+1)·budget), which gives the provable bounds: a bin's
    * token total never exceeds budget + its straddling doc, and the
    * cumulative total through bin b reaches the next bin's start offset
    * whenever a later bin exists. (A doc under-fills its bin exactly when
    * the previous bin's straddler ate into this bin's window; a doc
    * larger than the budget skips bin ids — both inherent to streaming
    * packing.) Pure BIGINT arithmetic — exact and replayable. */
  def packBins(df: DataFrame, shardCol: String, idCol: String,
      tokenCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__toks", tokenCol.cast("long"))
      .withColumn("__cum", sum(col("__toks")).over(w))
      .withColumn("bin", expr(s"(__cum - __toks) div $budget"))
      .drop("__cum")
      .withColumnRenamed("__toks", "toks")
  }

  /** Token-budget corpus selection — the curation step every training
    * run ends with: each group (domain/source/language) contributes its
    * BEST documents until its token budget is spent. Rows are ranked
    * (score DESC, id ASC) within the group and selected while the
    * running token total stays ≤ `budget` — the greedy
    * quality-per-token rule, deterministic and SQL-replayable. Output
    * is EXACTLY (group, id, score, tokens, cum_tokens) — projected
    * explicitly, so input columns never leak through, and input names
    * that would collide with the output or the internal working
    * columns are rejected up front (ADVICE r17 #3).
    *
    * Scale shape (the [[capPerGroup]] two-phase trick, adapted to a
    * prefix sum): a selected row's within-group rank is ≤ `budget`
    * (every better row costs ≥ 1 token — rows with < 1 token are
    * excluded up front to keep that bound sound), so phase 1 prunes to
    * the top-`budget` rows per (group, salt) bucket — a billion-row
    * domain splits across `salts` tasks and sheds everything that
    * could never qualify. Phase 2 runs the exact cumulative sum on the
    * ≤ salts·budget survivors per group — bounded window state, no
    * single-task domain sort. Identical to the unsalted selection by
    * the same superset argument as [[capPerGroup]]. */
  def budgetSelect(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: Column, tokenCol: Column, budget: Long,
      salts: Int = 16): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(salts > 0, "salts must be positive")
    val reserved = Seq("score", "tokens", "cum_tokens",
      "__score", "__toks", "__salt", "__r")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty, "budgetSelect: input column(s) " +
      s"${clash.mkString(", ")} collide with the output/working columns " +
      s"(${reserved.mkString(", ")}); rename them first")
    val w1 = Window.partitionBy(col(groupCol), col("__salt"))
      .orderBy(col("__score").desc, col(idCol))
    val w2 = Window.partitionBy(col(groupCol))
      .orderBy(col("__score").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__score", scoreCol)
      .withColumn("__toks", tokenCol.cast("long"))
      .filter(col("__toks") >= 1)
      .withColumn("__salt", idHash(col(idCol)) % salts)
      .withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= budget)
      .withColumn("cum_tokens", sum(col("__toks")).over(w2))
      .filter(col("cum_tokens") <= budget)
      .select(col(groupCol), col(idCol), col("__score").as("score"),
        col("__toks").as("tokens"), col("cum_tokens"))
  }

  /** Domain/source capping: keep the top `k` rows per group by `orderCol`
    * DESC (ties broken by id asc) — the quality-weighted domain-mixing
    * step that stops one giant domain from dominating a corpus.
    *
    * Deliberately NOT a single window over the group: at 100 TB one
    * domain can hold billions of rows, and `row_number() OVER
    * (PARTITION BY domain)` sorts that whole domain through one task —
    * the canonical window skew. Instead, two phases:
    *   1. local top-k within (group, salt) — `salts` deterministic
    *      hash-salt buckets, so the heaviest domain splits across tasks;
    *   2. exact top-k over the ≤ k·salts survivors per group.
    * Any row in a group's true top-k is also in its salt bucket's top-k,
    * so the result is identical to the unsalted window — phase 1 only
    * sheds rows that could never qualify. Output gains `rnk` (1-based
    * final rank within the group). */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      orderCol: Column, k: Int, salts: Int = 16): DataFrame = {
    require(k > 0, "k must be positive")
    require(salts > 0, "salts must be positive")
    val w1 = Window.partitionBy(col(groupCol), col("__salt"))
      .orderBy(orderCol.desc, col(idCol))
    val w2 = Window.partitionBy(col(groupCol))
      .orderBy(orderCol.desc, col(idCol))
    df.withColumn("__salt", idHash(col(idCol)) % salts)
      .withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= k)
      .drop("__r")
      .withColumn("rnk", row_number().over(w2).cast("long"))
      .filter(col("rnk") <= k)
      .drop("__salt")
  }

  /** Weighted sampling without replacement, A-ES (Efraimidis–Spirakis
    * 2006): each row draws a deterministic uniform u ∈ (0,1) from its id
    * ([[idHashSeeded]], +0.5 so u is never 0) and is ranked by the key
    * u^(1/w) — the classic one-pass reservoir key under which the top-k
    * rows are EXACTLY a weight-proportional sample without replacement.
    * Deterministic: same seed ⇒ same sample across runs, re-ingestions,
    * and repartitionings; a new seed is a fresh draw.
    *
    * Scale shape: the key is a stateless projection and the top-k is
    * `orderBy(key).limit(k)` — Spark plans TakeOrderedAndProject (each
    * task keeps a k-heap, the driver merges k·tasks rows), never a global
    * sort. Rows with non-positive weight can never be sampled and are
    * filtered up front. The id tie-break is unreachable (distinct ids ⇒
    * distinct u) but makes the order total for the oracle replay. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (idHashSeeded(col(idCol), seed).cast("double") + lit(0.5)) /
      lit(2147483647.0)
    df.filter(col(weightCol) > 0)
      .withColumn("__key", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** Recipe-proportioned mixture sampling: draw `quotas(g)` rows from
    * each group `g` (language, source, domain tier, …), chosen by
    * deterministic seeded-hash order within the group — the "data
    * recipe" step that turns per-source weights into an actual training
    * mixture. Groups absent from the recipe are dropped; a group with
    * fewer rows than its quota yields all of them (the recipe is a cap,
    * not a promise).
    *
    * Scale shape: the recipe is a broadcast |recipe|-row join; the only
    * wide operation is one window keyed BY GROUP (parallelism = number
    * of mixture components). Unlike [[capPerGroup]] the quota differs
    * per group — and mixture components are few and balanced by
    * construction, so the per-group window is the right plan and the
    * salted two-phase top-k would be pure overhead. */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
      quotas: Map[String, Int], seed: Long): DataFrame = {
    require(quotas.nonEmpty, "quotas must be non-empty")
    require(quotas.values.forall(_ > 0), "quotas must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val recipe = quotas.toSeq.toDF(groupCol, "__quota")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__h"), col(idCol))
    df.withColumn("__h", idHashSeeded(col(idCol), seed))
      .join(broadcast(recipe), groupCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__quota"))
      .drop("__h", "__quota", "__rn")
  }

  /** Seeded shuffle hash: h1 = (id' · 48271 + seed) mod P, then the
    * NONLINEAR mix h = (h1² + h1) mod P (P = 2³¹−1). The squaring is the
    * point: any purely affine seeding (like [[idHash]] with an additive
    * seed) shifts every hash by the same constant, so a new seed only
    * ROTATES the sorted order instead of re-permuting it — (h1+Δ)²
    * makes pairwise differences depend on h1, giving a genuinely
    * different order per seed (spec-asserted). The +h1 term breaks the
    * x ↔ P−x collision symmetry of a bare square. Same overflow-safety
    * contract as [[idHash]]: id reduced mod 2³¹ first, every
    * intermediate < 2⁶³, so the exact arithmetic replays in any ANSI
    * SQL engine. */
  def idHashSeeded(id: Column, seed: Long): Column = {
    val p = lit(2147483647L)
    val h1 = (pmod(id, lit(2147483648L)) * lit(48271L) + lit(seed)) % p
    (h1 * h1 + h1) % p
  }

  /** Deterministic corpus shuffle + shard assignment: every row gets a
    * seeded pseudorandom hash, a shard = hash mod `nShards`, and a
    * position within its shard (hash order, id tie-break) — the
    * reproducible training-order randomization every corpus export runs
    * (same seed ⇒ identical order across runs, re-ingestions, and
    * repartitionings; a new seed is a fresh permutation).
    *
    * Scale shape: the hash and shard are stateless projections; the only
    * wide operation is one window keyed BY SHARD — parallelism = shard
    * count, which is exactly the export's file parallelism, and never a
    * global single-partition row_number (the classic unscalable corpus
    * shuffle). Pure 64-bit integer arithmetic, replayed exactly by the
    * SQL oracle. */
  def shuffleShards(docs: DataFrame, idCol: String, nShards: Int,
      seed: Long): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val h = idHashSeeded(col(idCol), seed)
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    docs.select(col(idCol), h.as("__h"))
      .withColumn("shard", col("__h") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Context-window segmentation: split each document into overlapping
    * `width`-word windows at `stride`-word steps — the chunking step that
    * feeds context-bounded training examples and retrieval passages.
    * Window i of a doc covers words [i·stride, min(i·stride+width, n));
    * every word is covered, neighbors share width−stride words, and only
    * the final window can be short. One compiled projection
    * (CatalystExpressions.WordWindows) + posexplode — stateless,
    * embarrassingly parallel, no shuffle; output grows by roughly
    * width/stride × the corpus token count, which is the inherent cost
    * of overlap, not a plan artifact. Exact and SQL-replayable. */
  def segmentDocs(docs: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1, s"width/stride must be >= 1")
    require(stride <= width,
      s"stride=$stride > width=$width would drop words between windows")
    graft.functions.CatalystExpressions.register(docs.sparkSession)
    docs.select(col(idCol),
        posexplode(call_function("graft_word_windows", col(textCol),
          lit(width), lit(stride))).as(Seq("seg_id", "seg_text")))
      .select(col(idCol), col("seg_id").cast("long").as("seg_id"),
        col("seg_text"))
  }

  /** Quality-filter funnel: classify every row by the FIRST rule it
    * fails (rules in order; survivors get 'pass') and count each bucket —
    * the per-rule observability every production corpus filter ships
    * with, so a threshold change shows exactly where documents die.
    * One pass, one aggregation: the verdict is a row-local CASE chain,
    * so the funnel costs the same as a plain count(*) GROUP BY and never
    * re-scans per rule. `rules` are (name, passes-predicate), evaluated
    * against the row. */
  def filterFunnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    // NULL predicate = FAILS the rule, in both the funnel and the filter:
    // a bare when(!passes, name) would skip a NULL condition (three-valued
    // logic) and let the row fall through to 'pass' here while
    // applyFunnel's filter drops it — counts and survivors would no
    // longer partition consistently. `<=> true` pins NULL to false.
    val verdict = rules.foldRight(lit("pass")) { case ((name, passes), rest) =>
      when(!(passes <=> true), lit(name)).otherwise(rest)
    }
    df.groupBy(verdict.as("verdict"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** The survivors of a [[filterFunnel]] rule set — same CASE chain,
    * kept as rows instead of counts (NULL predicates fail, as above). */
  def applyFunnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    rules.foldLeft(df) { case (acc, (_, passes)) => acc.filter(passes <=> true) }

  /** Deterministic seed for a named shard — a plain 31-rolling hash of
    * the shard NAME (mod 1e9+7). Driver-side on purpose: the constant
    * is embedded in the plan (and in the oracle SQL) — what matters for
    * rendezvous stability is that a shard's seed depends only on its
    * name, never on its position in the current shard list. */
  def shardSeed(name: String): Long =
    name.foldLeft(7L)((a, c) => (a * 31 + c.toLong) % 1000000007L)

  /** RENDEZVOUS (highest-random-weight) shard routing — the stable
    * assignment every sharded index/lake maintains: route each row to
    * the shard whose seeded hash of the row id is highest. The property
    * that makes it the right primitive (and the thing the spec proves):
    * adding a shard moves ONLY the rows the new shard wins (≈ 1/(n+1)
    * of them) and removing a shard moves ONLY that shard's rows —
    * mod-N routing ([[shuffleShards]]' export layout) reshuffles
    * nearly everything on any change, which at 100 TB means rewriting
    * the whole lake instead of 1/n of it.
    *
    * Stateless projection — no shuffle at all: |shards| seeded hashes
    * per row folded with `greatest` over (hash, name) structs
    * (deterministic tie-break), exactly replayable in SQL as a
    * cross-join argmax over the same integer arithmetic. */
  def rendezvousRoute(df: DataFrame, idCol: String,
      shards: Seq[String]): DataFrame = {
    require(shards.nonEmpty, "at least one shard")
    require(shards.distinct.size == shards.size, "shard names must be distinct")
    if (shards.size == 1) return df.withColumn("shard", lit(shards.head))
    val scored = shards.map { sh =>
      struct(rendezvousHash(col(idCol), shardSeed(sh)).as("h"),
        lit(sh).as("s"))
    }
    df.withColumn("shard", greatest(scored: _*).getField("s"))
  }

  /** The rendezvous weight: MULTIPLICATIVE seed coupling + two
    * square-mix rounds, all mod 2³¹−1 in 64-bit-safe integer
    * arithmetic. [[idHashSeeded]] is NOT reusable here: its seed enters
    * additively, so two shards' hashes differ by a constant shift of
    * h1 and one quadratic dominates the argmax almost everywhere
    * (measured: 1835/84/81 over three shards). Coupling the seed as an
    * odd multiplier decorrelates the per-shard sequences (measured:
    * 651/677/672, ~25% movement on a 4th-shard add — the 1/(n+1)
    * theory rate). Largest product (2³¹)·(2³¹−1) < 2⁶³ — replayable in
    * any 64-bit SQL engine. */
  def rendezvousHash(id: Column, seed: Long): Column = {
    val p = lit(2147483647L)
    val h1 = ((pmod(id, lit(2147483648L)) + 1L) *
      lit((2 * seed + 1) % 2147483647L)) % p
    val h2 = (h1 * h1 + h1) % p
    (h2 * h2 + h2) % p
  }

  /** Cross-group QUANTILE NORMALIZATION — the score-calibration
    * transform (bioinformatics' quantile normalization applied to
    * curation): quality scores from different sources/classifiers are
    * not comparable (each source has its own score distribution, so one
    * global threshold over/under-keeps per source); map every row's
    * score to the POOLED distribution's value at the row's within-group
    * quantile, after which a single global threshold keeps the same
    * fraction of every group. Everything integer and deterministic:
    *
    *  - within-group rank r of n_g (row_number by (unit, id));
    *  - pooled target position p = ⌈r·N / n_g⌉ (integer arithmetic;
    *    r·N stays under 2⁶³ to N·max n_g ≈ 9·10¹⁸ — decimals past that);
    *  - normalized value = the pooled multiset's p-th smallest
    *    (percentile_disc semantics), read off an exact pooled CDF.
    *
    * Shape — built for a bounded score domain (units on a fixed grid,
    * ≤ ~10⁶ distinct values), which makes the pooled CDF EXACT and
    * TINY without any N-row global sort (the q77 rule) or per-row
    * nested-loop probe:
    *  - one keyed window exchange for (r, n_g) — the only corpus-sized
    *    shuffle;
    *  - pooled CDF = value histogram (map-side-combined agg) + a
    *    running sum over ≤|distinct units| rows (the one global-order
    *    window, on the tiny frame);
    *  - p → value lookup = BANDED interval equi-join (the [[RangeJoin]]
    *    rewrite in integer domain): each CDF interval (lo, hi] explodes
    *    to its covering width-W buckets with W ≈ N/|distinct units|
    *    (so the exploded build side stays ≈ 2·|distinct units| rows),
    *    probes join on p div W + residual filter — never a
    *    BroadcastNestedLoopJoin.
    * Group/corpus totals ride a broadcast 1-row stats frame (the q81
    * span pattern) — nothing is collected to the driver. */
  def quantileNormalize(df: DataFrame, idCol: String, grpCol: String,
      unitCol: String): DataFrame = {
    val w = Window.partitionBy(col(grpCol)).orderBy(col("__u0"), col(idCol))
    val wg = Window.partitionBy(col(grpCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rows = df.select(col(idCol), col(grpCol),
        col(unitCol).cast("long").as("__u0"))
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__ns", count(lit(1)).over(wg))
    val hist = df.groupBy(col(unitCol).cast("long").as("__u"))
      .agg(count(lit(1)).as("__cnt"))
    val wc = Window.orderBy(col("__u"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cdf = hist
      .withColumn("__hi", sum(col("__cnt")).over(wc))
      .withColumn("__lo", col("__hi") - col("__cnt"))
    val stats = broadcast(
      hist.agg(count(lit(1)).as("__nu"), sum(col("__cnt")).as("__N")))
    val wBand = "greatest(__N div __nu, 1)"
    val bands = cdf.crossJoin(stats)
      .withColumn("__b",
        explode(expr(s"sequence((__lo + 1) div ($wBand), __hi div ($wBand))")))
      .select(col("__u"), col("__lo"), col("__hi"), col("__b"))
    val probe = rows.crossJoin(stats)
      .withColumn("__p", expr("(__r * __N + __ns - 1) div __ns"))
      .withColumn("__b", expr(s"__p div ($wBand)"))
    probe.join(bands, Seq("__b"))
      .filter(col("__p") > col("__lo") && col("__p") <= col("__hi"))
      .select(col(idCol), col(grpCol), col("__u0").as(unitCol),
        col("__u").as("norm_u"))
  }

  /** Deterministic seeded NEGATIVE sampling (contrastive-training pairs:
    * every anchor needs k random non-matching examples, reproducibly,
    * WITHOUT the |corpus|² cross join a naive "sample k others" implies):
    * documents hash into `nBuckets` buckets (seeded nonlinear id hash);
    * a per-bucket RESERVOIR of `perBucket` candidates is drawn by a
    * second seeded hash via the partial/final
    * [[graft.plans.TopKPerGroup]] operator (exchange bounded by
    * buckets·partitions·perBucket); anchor a's j-th negative is the
    * reservoir candidate of bucket (bucket(a)+j) mod nBuckets minimizing
    * a third per-(anchor,candidate) seeded mix — so negatives vary per
    * anchor, never repeat within an anchor (distinct target buckets),
    * and can never equal the anchor (j ≥ 1 keeps the target off the
    * anchor's own bucket).
    *
    * Scale shape: the reservoir (nBuckets·perBucket rows — the bounded
    * driver-side planner-metadata class, like the IVF codebooks) rides
    * the plan as a MAP LITERAL; each anchor's k negatives are an in-row
    * fold over ≤perBucket candidates — ZERO joins, zero shuffles beyond
    * the reservoir's own bounded exchange. Pure 64-bit integer
    * arithmetic, replayed exactly by the SQL oracle. */
  def negativeSample(docs: DataFrame, idCol: String = "doc_id",
      nBuckets: Int = 8, perBucket: Int = 4, k: Int = 3,
      seed: Long = 1001L): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    require(k >= 1 && k < nBuckets,
      s"k must be in [1, nBuckets) so targets never hit the anchor's bucket")
    require(perBucket >= 1, s"perBucket must be >= 1, got $perBucket")
    val withBkt = docs.select(col(idCol).cast("long").as("__id"))
      .withColumn("__bkt", idHashSeeded(col("__id"), seed) % nBuckets)
    val res = graft.plans.TopKPerGroup.topKPerGroup(
      withBkt.withColumn("__h2", idHashSeeded(col("__id"), seed + 1)),
      Seq("__bkt"), Seq(col("__h2").asc, col("__id").asc), perBucket)
    // bounded driver collect: ≤ nBuckets·perBucket rows (documented
    // planner-metadata class) — becomes the literal reservoir map
    val byBucket: Map[Long, Seq[Long]] = res
      .select(col("__bkt"), col("__id")).collect()
      .groupBy(_.getLong(0)).map { case (b, rows) =>
        b -> rows.map(_.getLong(1)).sorted.toSeq
      }
    val buckets = byBucket.keys.toSeq.sorted
    val resMap = map_from_arrays(
      typedLit(buckets),
      typedLit(buckets.map(byBucket)))
    def argmin(cands: Column): Column =
      aggregate(cands,
        struct(lit(Long.MaxValue).as("m"), lit(-1L).as("c")),
        (acc, cand) => {
          val m = idHashSeeded(col("__id") * lit(8191L) + cand, seed + 2)
          when(m < acc.getField("m") ||
            (m === acc.getField("m") && cand < acc.getField("c")),
            struct(m.as("m"), cand.as("c"))).otherwise(acc)
        }).getField("c")
    val negs = (1 to k).map { j =>
      struct(lit(j.toLong).as("j"),
        argmin(element_at(resMap, (col("__bkt") + j) % nBuckets)).as("neg_id"))
    }
    withBkt
      .select(col("__id"), explode(array(negs: _*)).as("__s"))
      .select(col("__id").as(idCol), col("__s.j").as("j"),
        col("__s.neg_id").as("neg_id"))
      .filter(col("neg_id").isNotNull && col("neg_id") >= 0)
  }
}
