package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Curation
import graft.queries.Queries.{dround6, duckWordGrams, table, Q}

/** Dataset-curation query pack (q47–q50): deterministic splitting,
  * balanced downsampling, token-budget packing, and benchmark
  * decontamination — the steps between "clean corpus" and "training
  * batches". q47–q49's assignments are pure integer-hash functions of
  * the document id; q50 is a shingle semi-join over the hash-derived
  * splits. All are deterministic (no rand(), no position-dependence),
  * so every query is replayed exactly by its DuckDB oracle.
  */
object CurationQueries {

  /** DuckDB twin of Curation.idHash (mod-2^31 reduction before the
    * multiply keeps the product inside 64 bits on both engines). */
  private def duckHash(id: String) =
    s"((($id % 2147483648) * 2654435761 + 2654435769) % 4294967296)"

  private val q47 = Q(
    (s, dir) => Curation.assignSplit(table(s, dir, "documents"), "doc_id",
        trainPct = 80, valPct = 10)
      .select(col("doc_id"), col("lang"), col("split"))
      .orderBy("doc_id"),
    Some("SELECT doc_id, lang, CASE " +
      s"WHEN ${duckHash("doc_id")} % 100 < 80 THEN 'train' " +
      s"WHEN ${duckHash("doc_id")} % 100 < 90 THEN 'val' " +
      "ELSE 'test' END AS split FROM documents ORDER BY doc_id"),
    "Deterministic 80/10/10 train/val/test split by multiplicative id " +
      "hash — stable under re-ingestion and corpus growth")

  private val q48 = Q(
    (s, dir) => Curation.balancedSample(table(s, dir, "documents"),
        groupCol = "lang", idCol = "doc_id", keep = 40)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id"),
    Some("SELECT doc_id, lang FROM (SELECT doc_id, lang, row_number() OVER " +
      s"(PARTITION BY lang ORDER BY ${duckHash("doc_id")}, doc_id) AS rn " +
      "FROM documents) WHERE rn <= 40 ORDER BY doc_id"),
    "Per-language balanced downsample: keep 40 docs per lang by " +
      "deterministic hash order (class rebalancing before training)")

  private val q49 = Q(
    (s, dir) => Curation.packBins(table(s, dir, "documents"),
        shardCol = "lang", idCol = "doc_id",
        tokenCol = size(split(col("text"), " ")), budget = 512L)
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_toks"))
      .orderBy("lang", "bin"),
    Some("WITH t AS (SELECT doc_id, lang, " +
      "CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents), " +
      "c AS (SELECT lang, toks, sum(toks) OVER (PARTITION BY lang ORDER BY doc_id " +
      "ROWS UNBOUNDED PRECEDING) AS cum FROM t) " +
      "SELECT lang, CAST((cum - toks) // 512 AS BIGINT) AS bin, count(*) AS n_docs, " +
      "CAST(sum(toks) AS BIGINT) AS bin_toks " +
      // NULLS FIRST matches Spark's ascending default (a NULL-text doc
      // yields a NULL bin group; DuckDB alone would sort it last)
      "FROM c GROUP BY lang, bin ORDER BY lang, bin NULLS FIRST"),
    "Token-budget sequence packing (512-token bins per lang shard): the " +
      "streaming batch-builder assignment, packed within shards so no " +
      "global single-partition window exists")

  // split replayed by hash, shingles as distinct word 5-grams, overlap
  // via an EXISTS (the SQL form of the engine's left-semi shingle join).
  // Shared by q50 (inline split) and q51 (materialized split): both
  // compute the identical contamination set.
  private val decontOracle =
    "WITH sp AS (SELECT doc_id, text, CASE " +
      s"WHEN ${duckHash("doc_id")} % 100 < 80 THEN 'train' " +
      s"WHEN ${duckHash("doc_id")} % 100 < 90 THEN 'val' " +
      "ELSE 'test' END AS split FROM documents), " +
      "g AS (SELECT doc_id, split, " +
      s"${duckWordGrams("ws", 5)} AS g " +
      "FROM (SELECT doc_id, split, string_split(text, ' ') AS ws FROM sp)) " +
      "SELECT DISTINCT tr.doc_id FROM g tr WHERE tr.split = 'train' AND EXISTS " +
      "(SELECT 1 FROM g te WHERE te.split = 'test' AND te.g = tr.g) " +
      "ORDER BY doc_id"

  private val q50 = Q(
    (s, dir) => {
      val docs = table(s, dir, "documents")
      // the split is re-derived on both scan branches here (cheap hash
      // projection); q51 below is the production shape that materializes
      // the split column once and reads both sides pre-filtered
      val withSplit = Curation.assignSplit(docs, "doc_id")
      val train = withSplit.filter(col("split") === "train")
      val bench = withSplit.filter(col("split") === "test")
      Curation.decontaminate(train, bench, "doc_id", "text", width = 5)
        .orderBy("doc_id")
    },
    Some(decontOracle),
    "Benchmark decontamination: train docs sharing any word 5-gram with " +
      "the held-out split, via an inverted-index semi join (never doc x doc)")

  private val q51 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q51"
      // production shape: the split column is materialized ONCE as a
      // partition column at curation time; every downstream consumer
      // (decontamination here) then reads its side partition-PRUNED —
      // no split re-derivation, and the scan itself skips the other
      // splits' files entirely (the thing that matters when 'documents'
      // is 100 TB and 'test' is 10%)
      // repartition before the write: the source table is a single row
      // group (one scan task), so an unshuffled write leaves ONE file per
      // split directory and the expensive read-back side (5-gram shingle
      // explode) would run single-task while the oracle parallelizes.
      // 16 files per split is the layout a real curation job produces
      // anyway (one per writer task) — the shuffle moves ~nothing (docs
      // are narrow), the read-back gains 16-way scan parallelism.
      Curation.assignSplit(table(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("text"), col("split"))
        .repartition(16)
        .write.mode("overwrite").option("compression", "none")
        .partitionBy("split").parquet(scratch)
      // explicit schema on read-back: the curation job that wrote the
      // split knows the layout, so the reader skips the footer-sampling
      // schema-inference job (a fixed cost that at 100 TB would sample
      // remote files for a schema the catalog already knows)
      val mat = s.read.schema("doc_id BIGINT, text STRING, split STRING")
        .parquet(scratch)
      val train = mat.filter(col("split") === "train")
      val bench = mat.filter(col("split") === "test")
      Curation.decontaminate(train, bench, "doc_id", "text", width = 5)
        .orderBy("doc_id")
    },
    Some(decontOracle),
    "Materialized-split decontamination round trip: split written once as " +
      "a partition column, both sides read partition-pruned, same " +
      "contamination set as q50")

  // q67: domain capping — top-5 docs per source by quality score. The
  // engine runs the salted two-phase top-k (see Curation.capPerGroup);
  // the oracle is the plain window, identical by the top-k containment
  // argument, so the hash check *proves* the salted rewrite exact.
  private val q67 = Q(
    (s, dir) => {
      val docs = table(s, dir, "documents")
        .withColumn("score", graft.ops.TextAnalysis.qualityScore(col("text")))
      Curation.capPerGroup(docs, "source", "doc_id", col("score"), k = 5)
        .select(col("source"), col("rnk"), col("doc_id"), col("score"))
        .orderBy("source", "rnk")
    },
    Some("WITH sc AS (SELECT source, doc_id, " + Queries.duckQualityScore +
      " AS score FROM documents), " +
      "r AS (SELECT source, doc_id, score, CAST(row_number() OVER " +
      "(PARTITION BY source ORDER BY score DESC, doc_id) AS BIGINT) AS rnk FROM sc) " +
      "SELECT source, rnk, doc_id, score FROM r WHERE rnk <= 5 " +
      "ORDER BY source, rnk"),
    "Domain capping: top-5 docs per source by quality, salted two-phase " +
      "top-k (no single-task domain sort) proven equal to the plain window")

  // q213: token-budget corpus selection — each source contributes its
  // best docs (quality DESC, id ASC) until an 800-token budget is
  // spent: the greedy quality-per-token rule every training run's final
  // curation step applies. The engine runs the salted two-phase form
  // (top-`budget` per (source, salt) prune, exact prefix sum on the
  // bounded survivors — see Curation.budgetSelect); the oracle is the
  // plain window, so the hash check proves the salted rewrite exact —
  // the q67 convention lifted from top-k to a prefix sum.
  private val q213 = Q(
    (s, dir) => Curation.budgetSelect(table(s, dir, "documents"),
        "source", "doc_id",
        graft.ops.TextAnalysis.qualityScore(col("text")),
        size(split(col("text"), " ")).cast("long"), budget = 800L)
      .select(col("source"), col("doc_id"), col("score"), col("tokens"),
        col("cum_tokens"))
      .orderBy("source", "cum_tokens"),
    Some("WITH sc AS (SELECT source, doc_id, " + Queries.duckQualityScore +
      " AS score, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens " +
      "FROM documents WHERE text IS NOT NULL), " +
      "c AS (SELECT source, doc_id, score, tokens, CAST(sum(tokens) OVER " +
      "(PARTITION BY source ORDER BY score DESC, doc_id " +
      "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM sc) " +
      "SELECT source, doc_id, score, tokens, cum_tokens FROM c " +
      "WHERE cum_tokens <= 800 ORDER BY source, cum_tokens"),
    "Token-budget selection: best docs per source until the token " +
      "budget is spent — salted two-phase prefix sum (no single-task " +
      "domain sort) proven equal to the plain window")

  // q153: cross-source quantile normalization — per-source quality
  // scores mapped onto the pooled distribution (percentile_disc
  // semantics) so one global threshold keeps the same fraction of
  // every source. All integer: rank r of n_g within source, pooled
  // position p = ceil(r*N/n_g), value = pooled p-th smallest read off
  // the exact unit-histogram CDF. The engine's banded interval join is
  // proven equal to the oracle's direct inequality join by the hash
  // check.
  private val q153 = Q(
    (s, dir) => {
      val docs = table(s, dir, "documents")
        .withColumn("u", graft.ops.TimeSeries.toUnits(
          graft.ops.TextAnalysis.qualityScore(col("text"))))
      Curation.quantileNormalize(docs, "doc_id", "source", "u")
        .orderBy("doc_id")
    },
    Some("WITH d AS (SELECT doc_id, source, " +
      "CAST(floor((" + Queries.duckQualityScore + ") * 1000000 + 0.5) " +
      "AS BIGINT) AS u FROM documents), " +
      "r AS (SELECT doc_id, source, u, CAST(row_number() OVER " +
      "(PARTITION BY source ORDER BY u, doc_id) AS BIGINT) AS r, " +
      "count(*) OVER (PARTITION BY source) AS ns FROM d), " +
      "h AS (SELECT u AS hu, count(*) AS cnt FROM d GROUP BY hu), " +
      "c AS (SELECT hu, sum(cnt) OVER (ORDER BY hu) AS hi, " +
      "sum(cnt) OVER (ORDER BY hu) - cnt AS lo FROM h), " +
      "t AS (SELECT count(*) AS n FROM d) " +
      "SELECT r.doc_id, r.source, r.u, c.hu AS norm_u " +
      "FROM r, t, c WHERE ((r.r * t.n + r.ns - 1) // r.ns) > c.lo " +
      "AND ((r.r * t.n + r.ns - 1) // r.ns) <= c.hi " +
      "ORDER BY r.doc_id"),
    "Cross-source quantile normalization: within-source rank mapped to " +
      "the pooled distribution's value (exact integer CDF, banded " +
      "interval join) — score calibration before a global threshold")

  // q158: rendezvous (highest-random-weight) shard routing — the stable
  // assignment that moves only 1/n of the lake on shard add/remove
  // where mod-N reshuffles everything. Stateless projection; the
  // oracle replays the seeded-hash argmax as a cross-join row_number.
  private val q158Shards = Seq("shard-a", "shard-b", "shard-c", "shard-d")
  private val q158 = Q(
    (s, dir) => Curation.rendezvousRoute(table(s, dir, "documents"),
        "doc_id", q158Shards)
      .select(col("doc_id"), col("shard"))
      .orderBy("doc_id"),
    Some("WITH s AS (SELECT * FROM (VALUES " +
      q158Shards.map(sh => s"('$sh', ${Curation.shardSeed(sh)})")
        .mkString(", ") + ") t(sh, seed)), " +
      "h AS (SELECT d.doc_id, t.sh, " +
      "((d.doc_id % 2147483648 + 1) * ((2*t.seed + 1) % 2147483647)) % 2147483647 AS h1 " +
      "FROM documents d CROSS JOIN s t), " +
      "g2 AS (SELECT doc_id, sh, (h1*h1 + h1) % 2147483647 AS h2 FROM h), " +
      "g AS (SELECT doc_id, sh, (h2*h2 + h2) % 2147483647 AS h FROM g2) " +
      "SELECT doc_id, sh AS shard FROM (SELECT doc_id, sh, row_number() " +
      "OVER (PARTITION BY doc_id ORDER BY h DESC, sh DESC) AS rn FROM g) " +
      "WHERE rn = 1 ORDER BY doc_id"),
    "Rendezvous shard routing: highest seeded hash wins — stable under " +
      "shard add/remove (only 1/n of rows move), stateless projection, " +
      "integer-exact argmax")

  // q69: quality-filter funnel — every doc classified by the first rule
  // it fails, one aggregation. Thresholds chosen so every bucket is
  // non-empty at the test SFs (probed in DuckDB).
  private val q69 = Q(
    (s, dir) => {
      val ws = split(col("text"), " ")
      val ttr = size(array_distinct(ws)).cast("double") / size(ws)
      val total = greatest(size(ws) - 1, lit(0))
      val rep = when(total === 0, lit(0.0)).otherwise(
        (total - size(graft.functions.TextFunctions.wordShingles(col("text"), 2)))
          .cast("double") / total)
      Curation.filterFunnel(
        table(s, dir, "documents"), // table() registers the graft expressions
        Seq(
          "r1_short" -> (size(ws) >= 25),
          "r2_ttr" -> (ttr >= 0.42),
          "r3_repeat" -> (rep <= 0.05),
          "r4_lang" -> col("lang").isin("de", "en", "es", "fr")))
        .orderBy("verdict")
    },
    Some("WITH w AS (SELECT lang, string_split(text, ' ') AS ws FROM documents), " +
      "m AS (SELECT lang, len(ws) AS toks, " +
      "CAST(len(list_distinct(ws)) AS DOUBLE)/len(ws) AS ttr, " +
      "CASE WHEN greatest(len(ws)-1, 0) = 0 THEN 0.0 ELSE " +
      s"CAST(greatest(len(ws)-1, 0) - len(list_distinct(${Queries.duckWordGramsList("ws", 2)})) AS DOUBLE)" +
      " / greatest(len(ws)-1, 0) END AS rep FROM w) " +
      "SELECT CASE WHEN NOT (toks >= 25) THEN 'r1_short' " +
      "WHEN NOT (ttr >= 0.42) THEN 'r2_ttr' " +
      "WHEN NOT (rep <= 0.05) THEN 'r3_repeat' " +
      "WHEN NOT (lang IN ('de','en','es','fr')) THEN 'r4_lang' " +
      "ELSE 'pass' END AS verdict, count(*) AS n_docs FROM m " +
      "GROUP BY 1 ORDER BY 1"),
    "Quality-filter funnel: per-rule drop counts (first failing rule of " +
      "min-length / type-token ratio / repetition / language whitelist) " +
      "in a single aggregation pass")

  // q76: context-window segmentation — overlapping 64-word windows at
  // 48-word steps (16 words of overlap between neighbors), the chunking
  // step that feeds context-bounded training examples and retrieval
  // passages. The window-count formula, slicing, and join are replayed
  // exactly by the oracle, so the segmentation is hash-checked end to
  // end. Compiled projection + posexplode; no shuffle before the
  // deterministic output sort.
  private val q76 = Q(
    (s, dir) => Curation.segmentDocs(table(s, dir, "documents"),
        "doc_id", "text", width = 64, stride = 48)
      .orderBy("doc_id", "seg_id"),
    Some("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
      "nn AS (SELECT doc_id, ws, len(ws) AS n FROM w), " +
      "s AS (SELECT doc_id, ws, unnest(range((greatest(n - 64, 0) + 47)//48 + 1)) AS i FROM nn) " +
      "SELECT doc_id, CAST(i AS BIGINT) AS seg_id, " +
      "array_to_string(ws[i*48+1:i*48+64], ' ') AS seg_text " +
      "FROM s ORDER BY doc_id, seg_id"),
    "Context-window segmentation: overlapping 64-word windows at 48-word " +
      "stride per document — training-chunk / retrieval-passage splitting " +
      "with every word covered and only the final window short")

  // q77: deterministic corpus shuffle + shard assignment — the
  // reproducible training-order randomization of a corpus export. The
  // seeded hash, shard modulus, and per-shard ranking are plain integer
  // arithmetic, replayed exactly; the only wide operation is the window
  // keyed by shard (parallelism = shard count — never a global
  // single-partition row_number).
  private val q77 = Q(
    (s, dir) => Curation.shuffleShards(table(s, dir, "documents"),
        "doc_id", nShards = 8, seed = 12345L)
      .orderBy("shard", "pos"),
    Some("WITH h1 AS (SELECT doc_id, " +
      "((doc_id % 2147483648) * 48271 + 12345) % 2147483647 AS g FROM documents), " +
      "h AS (SELECT doc_id, (g*g + g) % 2147483647 AS hh FROM h1) " +
      "SELECT doc_id, CAST(hh % 8 AS BIGINT) AS shard, " +
      "CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) AS BIGINT) AS pos " +
      "FROM h ORDER BY shard, pos"),
    "Deterministic seeded corpus shuffle: pseudorandom shard + in-shard " +
      "position per document — reproducible training-order randomization " +
      "with shard-level (never global-window) parallelism")

  // q88: A-ES weighted sampling without replacement — longer documents
  // proportionally likelier, sample exactly reproducible from (seed, id,
  // weight). The sampling key u^(1/w) is plain double arithmetic over
  // the seeded integer hash, so the oracle replays the identical draw;
  // the top-k itself is TakeOrderedAndProject (per-task k-heaps), never
  // a global sort.
  private val q88 = Q(
    (s, dir) => Curation.weightedSample(table(s, dir, "documents"),
        "doc_id", "n_chars", k = 100, seed = 777L)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id"),
    Some("WITH h1 AS (SELECT *, " +
      "((doc_id % 2147483648) * 48271 + 777) % 2147483647 AS g FROM documents), " +
      "h AS (SELECT *, (g*g + g) % 2147483647 AS hh FROM h1) " +
      "SELECT doc_id, lang, n_chars FROM (SELECT doc_id, lang, n_chars, " +
      "pow((CAST(hh AS DOUBLE) + 0.5) / 2147483647.0, " +
      "1.0 / CAST(n_chars AS DOUBLE)) AS k FROM h WHERE n_chars > 0 " +
      "ORDER BY k DESC, doc_id LIMIT 100) ORDER BY doc_id"),
    "Weighted sampling without replacement (Efraimidis–Spirakis A-ES " +
      "key u^(1/w)): deterministic, weight-proportional, distributed " +
      "top-k — the importance-weighted corpus draw")

  // q89: recipe-proportioned mixture — the per-language quota draw that
  // turns data-recipe weights (40% en / 15% each of de,es,fr,zh) into an
  // actual training mixture, deterministic under the seeded hash and
  // replayed exactly by the oracle's per-group window.
  private val q89 = Q(
    (s, dir) => Curation.mixtureSample(table(s, dir, "documents"),
        groupCol = "lang", idCol = "doc_id",
        quotas = Map("en" -> 40, "de" -> 15, "es" -> 15, "fr" -> 15, "zh" -> 15),
        seed = 42L)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id"),
    Some("WITH h1 AS (SELECT doc_id, lang, " +
      "((doc_id % 2147483648) * 48271 + 42) % 2147483647 AS g FROM documents), " +
      "h AS (SELECT doc_id, lang, (g*g + g) % 2147483647 AS hh FROM h1), " +
      "q AS (SELECT * FROM (VALUES ('en', 40), ('de', 15), ('es', 15), " +
      "('fr', 15), ('zh', 15)) AS t(lang, quota)) " +
      "SELECT doc_id, lang FROM (SELECT h.doc_id, h.lang, q.quota, " +
      "row_number() OVER (PARTITION BY h.lang ORDER BY h.hh, h.doc_id) AS rn " +
      "FROM h JOIN q ON h.lang = q.lang) WHERE rn <= quota ORDER BY doc_id"),
    "Recipe-proportioned mixture sample: per-group quotas from a data " +
      "recipe, deterministic seeded-hash draw within each group")

  // q92: denylist decontamination through the Bloom pre-filter — the
  // scan-side membership probe (codegen'd, filter shipped as a plan
  // literal) drops sure-negative docs before any Exchange; only
  // maybe-positives pay the exact anti join, so the shuffle is sized by
  // fpp·|corpus|+|matches|, not |corpus|. Result is bit-identical to
  // the plain anti join (BloomJoinSpec asserts it); the oracle replays
  // the exact-join semantics.
  private val q92 = Q(
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val deny = docs.filter(col("doc_id") % 13 === 0).select(col("doc_id"))
      graft.ops.BloomJoin.antiJoin(docs, deny, "doc_id", "doc_id",
          expectedItems = 1000L)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    },
    Some("SELECT doc_id, lang, source FROM documents " +
      "WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 13 = 0) " +
      "ORDER BY doc_id"),
    "Denylist decontamination via Bloom pre-filtered anti join: " +
      "sure-negatives bypass the shuffle, maybe-positives close with " +
      "the exact join — bit-identical to the plain anti join")

  /** Fuzzy (near-dup) decontamination — the leakage pass q50's exact
    * 5-gram overlap can't give: train docs whose shingle-set Jaccard
    * against ANY test doc reaches 0.8 (paraphrases, light edits), found
    * by the BIPARTITE MinHash+LSH band join
    * ([[graft.ops.Dedup.fuzzyDecontaminate]] — train postings equi-join
    * test postings, never train × test; candidates verified by the
    * exact Jaccard, so the answer equals brute force and the oracle
    * replays it directly: q50's hash-split composed with q20's exact
    * bipartite pair set). */
  private val q136 = Q(
    (s, dir) => {
      val withSplit = Curation.assignSplit(table(s, dir, "documents"), "doc_id")
      graft.ops.Dedup.fuzzyDecontaminate(
        withSplit.filter(col("split") === "train"),
        withSplit.filter(col("split") === "test"),
        "doc_id", "text", shingleWidth = 3, k = 128, bands = 32,
        threshold = 0.8)
    },
    Some("WITH sp AS (SELECT doc_id, text, CASE " +
      s"WHEN ${duckHash("doc_id")} % 100 < 80 THEN 'train' " +
      s"WHEN ${duckHash("doc_id")} % 100 < 90 THEN 'val' " +
      "ELSE 'test' END AS split FROM documents), " +
      "w AS (SELECT doc_id, split, string_split(text, ' ') AS ws FROM sp), " +
      s"s AS (SELECT DISTINCT doc_id, split, ${duckWordGrams("ws", 3)} AS sh FROM w), " +
      "c AS (SELECT a.doc_id AS train_id, b.doc_id AS bench_id, count(*) AS inter " +
      "FROM s a JOIN s b ON a.sh = b.sh AND a.split = 'train' AND b.split = 'test' " +
      "GROUP BY 1, 2), " +
      "z AS (SELECT doc_id, count(*) AS nsh FROM s GROUP BY 1) " +
      "SELECT train_id, bench_id, " +
      dround6("CAST(inter AS DOUBLE)/(x.nsh + y.nsh - inter)") + " AS jac " +
      "FROM c JOIN z x ON c.train_id = x.doc_id JOIN z y ON c.bench_id = y.doc_id " +
      "WHERE CAST(inter AS DOUBLE)/(x.nsh + y.nsh - inter) >= 0.8 " +
      "ORDER BY train_id, bench_id"),
    "Fuzzy benchmark decontamination: train docs near-duplicating any " +
      "held-out doc (bipartite MinHash+LSH band join, exact-Jaccard " +
      "verified) — catches the paraphrased leakage exact n-gram " +
      "overlap misses")

  // q180: deterministic seeded NEGATIVE sampling (contrastive pairs) —
  // reservoir per hash bucket via the custom TopKPerGroup operator,
  // reservoir rides the plan as a literal map (bounded planner metadata,
  // the codebook class), per-anchor argmin is an in-row fold: ZERO
  // joins/shuffles on the anchor side. The oracle replays reservoir
  // (row_number window), target-bucket join, and argmin verbatim in the
  // same 64-bit integer arithmetic.
  private def duckSeedHash(x: String, seed: Long): String = {
    val g = s"((($x) % 2147483648) * 48271 + $seed) % 2147483647"
    s"(($g)*($g) + ($g)) % 2147483647"
  }

  private val q180 = Q(
    (s, dir) => Curation.negativeSample(table(s, dir, "documents"),
        "doc_id", nBuckets = 8, perBucket = 4, k = 3, seed = 1001L)
      .orderBy("doc_id", "j"),
    Some("WITH b AS (SELECT doc_id, " +
      duckSeedHash("doc_id", 1001L) + " % 8 AS bkt FROM documents), " +
      "hh AS (SELECT doc_id, bkt, " +
      duckSeedHash("doc_id", 1002L) + " AS h2 FROM b), " +
      "res AS (SELECT bkt, doc_id AS cand FROM (SELECT bkt, doc_id, " +
      "row_number() OVER (PARTITION BY bkt ORDER BY h2, doc_id) AS rn " +
      "FROM hh) WHERE rn <= 4), " +
      "pj AS (SELECT a.doc_id, j.j, r.cand FROM b a " +
      "CROSS JOIN (VALUES (1), (2), (3)) AS j(j) " +
      "JOIN res r ON r.bkt = (a.bkt + j.j) % 8), " +
      "mx AS (SELECT doc_id, j, cand, " +
      duckSeedHash("doc_id * 8191 + cand", 1003L) + " AS m FROM pj), " +
      "pick AS (SELECT doc_id, j, cand, row_number() OVER " +
      "(PARTITION BY doc_id, j ORDER BY m, cand) AS rn FROM mx) " +
      "SELECT doc_id, CAST(j AS BIGINT) AS j, cand AS neg_id FROM pick " +
      "WHERE rn = 1 ORDER BY doc_id, j"),
    "Seeded negative sampling for contrastive training: bucketed " +
      "reservoir (custom top-k operator) as a literal map, per-anchor " +
      "in-row argmin — k negatives per anchor with zero anchor-side " +
      "joins")

  val all: Map[String, Q] = Map(
    "q180_negative_sample" -> q180,
    "q158_rendezvous" -> q158,
    "q153_quantile_normalize" -> q153,
    "q136_decontaminate_fuzzy" -> q136,
    "q92_bloom_decontaminate" -> q92,
    "q47_split_assign" -> q47,
    "q48_balanced_sample" -> q48,
    "q49_pack_bins" -> q49,
    "q50_decontaminate" -> q50,
    "q51_decontaminate_mat" -> q51,
    "q67_domain_cap" -> q67,
    "q213_budget_select" -> q213,
    "q69_filter_funnel" -> q69,
    "q76_segment_windows" -> q76,
    "q77_shuffle_shards" -> q77,
    "q88_weighted_sample" -> q88,
    "q89_mixture_sample" -> q89)
}
