package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Clustering, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.queries.Queries.{ddot, dround6, dsum, duckEmb, duckWordGrams, table, Q}

/** Training-data pipeline operator pack: deduplication, similarity search,
  * multimodal columns, text analysis (BASELINE.json north star, beyond the
  * reference's own call sites). Hash-dependent operators whose signatures
  * cannot be replayed in DuckDB (xxhash64-based MinHash/SimHash *candidate
  * generation*) verify candidates against an oracle-expressible exact
  * metric (q20/q21) — since r16 every declared query, q54 included,
  * carries a full hash-checked oracle.
  */
object TrainingDataQueries {

  // DuckDB: distinct word-3gram shingles per doc
  private val duckWordShingles =
    "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
      s"s AS (SELECT DISTINCT doc_id, ${duckWordGrams("ws", 3)} AS sh FROM w)"

  private val q20 = Q(
    (s, dir) => Dedup.minhashNearDups(table(s, dir, "documents"), "doc_id", "text",
      shingleWidth = 3, k = 128, bands = 32, threshold = 0.8),
    // Oracle: the exact Jaccard>=0.8 pair set (LSH with 32x4 bands has
    // miss probability <1e-7 at j>=0.8, so candidate generation is lossless
    // on this corpus and the verified output equals the exact answer).
    Some(duckWordShingles +
      ", c AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter " +
      "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "z AS (SELECT doc_id, count(*) AS nsh FROM s GROUP BY 1) " +
      "SELECT da, db, " + dround6("CAST(inter AS DOUBLE)/(x.nsh + y.nsh - inter)") + " AS jac " +
      "FROM c JOIN z x ON c.da = x.doc_id JOIN z y ON c.db = y.doc_id " +
      "WHERE CAST(inter AS DOUBLE)/(x.nsh + y.nsh - inter) >= 0.8 ORDER BY da, db"),
    "MinHash+LSH near-dup detection (word 3-gram shingles, 128 hashes, " +
      "32 bands), candidates verified by exact Jaccard >= 0.8")

  // DuckDB twin of CatalystExpressions.SimHash60: per-token chained
  // 31/37-base polynomial hashes with affine finalization, packed to 60
  // bits, then a per-bit strict-majority vote. Pure modular arithmetic —
  // bit-identical to the compiled Spark expression.
  private def duckPolyHash(base: Int, mod: Long, mulFin: Long, addFin: Long) =
    s"(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(t,''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a,b) -> (a*$base+b)%$mod) * $mulFin + $addFin) % $mod"

  private val duckSimhash60 =
    "WITH hs AS (SELECT doc_id, " +
      s"[ ${duckPolyHash(31, 1000000007L, 1103515245L, 12345L)} * 1073741824 " +
      s"+ ${duckPolyHash(37, 998244353L, 69069L, 1L)} " +
      "FOR t IN string_split(text, ' ') ] AS hs FROM documents), " +
      "sig AS (SELECT doc_id, CAST(list_sum([CASE WHEN " +
      "2*list_sum([(h >> b) & 1 FOR h IN hs]) > len(hs) " +
      "THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END " +
      "FOR b IN generate_series(0,59)]) AS BIGINT) AS sig FROM hs)"

  private val q21 = Q(
    (s, dir) => Dedup.simhashNearDupsReplayable(table(s, dir, "documents"),
      "doc_id", "text", maxHamming = 3),
    Some(duckSimhash60 +
      " SELECT a.doc_id AS da, b.doc_id AS db, " +
      "CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming " +
      "FROM sig a JOIN sig b ON a.doc_id < b.doc_id " +
      "WHERE bit_count(xor(a.sig, b.sig)) <= 3 ORDER BY da, db"),
    "SimHash near-dup detection (60-bit SQL-replayable signature, 15-bit " +
      "band blocking, Hamming <= 3), oracle-checked bit-for-bit")

  private val q22 = Q(
    (s, dir) => Dedup.ngramJaccardPairs(table(s, dir, "documents"), "doc_id", "text",
      blockCol = "lang", shingle = graft.functions.TextFunctions.wordShingles(_, 5),
      threshold = 0.5),
    // word 5-grams: discriminative shingles (char n-grams over this
    // corpus's 30-word vocabulary all collide, degenerating any exact
    // similarity join to all-pairs — see Dedup.ngramJaccardPairs notes)
    Some("WITH s AS (SELECT DISTINCT doc_id, lang, " +
      s"${duckWordGrams("ws", 5)} AS g " +
      "FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)), " +
      "c AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter " +
      "FROM s a JOIN s b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id " +
      "GROUP BY 1, 2), " +
      "z AS (SELECT doc_id, count(*) AS nsh FROM s GROUP BY 1) " +
      "SELECT da, db, " + dround6("CAST(inter AS DOUBLE)/(x.nsh + y.nsh - inter)") + " AS jac " +
      "FROM c JOIN z x ON c.da = x.doc_id JOIN z y ON c.db = y.doc_id " +
      "WHERE CAST(inter AS DOUBLE)/(x.nsh + y.nsh - inter) >= 0.5 ORDER BY da, db"),
    "Exact word-5-gram Jaccard near-dup pairs, blocked by lang, via " +
      "prefix-filtered inverted shingle-index join (never a cross join)")

  private val q23 = Q(
    (s, dir) => Similarity.cosinePairsBlocked(table(s, dir, "embeddings"),
      threshold = 0.4, nCells = 16),
    Some(duckEmb + " SELECT q.vec_id AS ida, c.vec_id AS idb, " +
      dround6(s"${ddot("q.v", "c.v")} / (q.nrm * c.nrm)") + " AS sim " +
      "FROM n q JOIN n c ON q.vec_id < c.vec_id " +
      s"WHERE ${ddot("q.v", "c.v")} / (q.nrm * c.nrm) >= 0.4 ORDER BY ida, idb"),
    "Embedding cosine near-dup pairs (threshold 0.4) via lossless IVF-cell " +
      "blocking — equi-join on admissible cell pairs, never a nested loop")

  private[queries] val duckLangCase = {
    def cnt(m: String) = s"len(list_filter(string_split(text, ' '), x -> x = '$m'))"
    val scores = TextAnalysis.markers.map { case (lang, ms) =>
      lang -> ms.map(cnt).mkString(" + ")
    }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    "CASE " + scores.map { case (lang, sc) =>
      s"WHEN ($sc) = $best THEN '$lang'"
    }.mkString(" ") + " END"
  }

  private val q24 = Q(
    (s, dir) => TextAnalysis.langId(table(s, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("pred_lang"))
      .orderBy("doc_id"),
    Some(s"SELECT doc_id, lang, $duckLangCase AS pred_lang FROM documents ORDER BY doc_id"),
    "Language-ID heuristic: marker-word scoring, argmax with asc tie-break")

  private val q25 = Q(
    (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("score"))
      .orderBy("doc_id"),
    Some("SELECT doc_id, " + Queries.duckQualityScore +
      " AS score FROM documents ORDER BY doc_id"),
    "Document quality scoring: token count + type-token ratio + word length")

  private val q26 = Q(
    (s, dir) => TextAnalysis.tokenCounts(table(s, dir, "documents"))
      .select(col("doc_id"), col("ws_toks"), col("re_toks"), col("chars_per_tok"))
      .orderBy("doc_id"),
    Some("SELECT doc_id, len(string_split(text, ' ')) AS ws_toks, " +
      "len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS re_toks, " +
      dround6("CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))") + " AS chars_per_tok " +
      "FROM documents ORDER BY doc_id"),
    "Token counting: whitespace + regex tokenizer")

  /** DuckDB twin of TextFunctions.polyHash over an arbitrary string
    * expression (chained (a·31 + c) mod 1e9+7 char fold). */
  private def duckCharFoldOf(expr: String): String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($expr, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      "(a, b) -> (a * 31 + b) % 1000000007)"

  private val duckCharFold = duckCharFoldOf("text")

  private val q27 = Q(
    (s, dir) => TextAnalysis.fingerprint(table(s, dir, "documents"))
      .select(col("doc_id"), col("fp"))
      .orderBy("doc_id"),
    Some(s"SELECT doc_id, $duckCharFold AS fp FROM documents ORDER BY doc_id"),
    "Document fingerprint: polynomial rolling hash over characters")

  // q80: TF-IDF keyword extraction. Ratio idf (N/df, no ln) keeps the
  // score IEEE-exact-replayable — the log is monotone so the top-k cut is
  // unchanged; ties broken by term asc so the cut is total-ordered.
  private val q80 = Q(
    (s, dir) => TextAnalysis.tfIdfTopK(table(s, dir, "documents"), k = 3)
      .orderBy("doc_id", "rnk"),
    Some("WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term " +
      "FROM documents WHERE text IS NOT NULL), " +
      "t AS (SELECT doc_id, term, count(*) AS tf FROM w " +
      "WHERE length(term) > 0 GROUP BY doc_id, term), " +
      "d AS (SELECT term, count(*) AS df FROM t GROUP BY term), " +
      "n AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL), " +
      "r AS (SELECT doc_id, term, tf, df, " +
      "CAST(tf * n AS DOUBLE) / df AS score, " +
      "row_number() OVER (PARTITION BY doc_id " +
      "ORDER BY CAST(tf * n AS DOUBLE) / df DESC, term) AS rnk " +
      "FROM t JOIN d USING (term) CROSS JOIN n) " +
      "SELECT doc_id, rnk, term, tf, df, score FROM r WHERE rnk <= 3 " +
      "ORDER BY doc_id, rnk"),
    "TF-IDF top-3 characteristic terms per document (ratio idf = N/df: " +
      "same ranking as ln-idf, bit-portable arithmetic), document " +
      "frequency broadcast back onto the tf frame")

  private val q28 = Q(
    (s, dir) => Multimodal.extractFeaturesDeclarative(table(s, dir, "documents"))
      .orderBy("doc_id"),
    // corpus is pure ASCII, so byte features == char features in the oracle
    Some("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes, " +
      "ascii(substr(text, 1, 1)) AS first_byte, " +
      s"$duckCharFold AS checksum FROM documents ORDER BY doc_id"),
    "Multimodal plumbing: opaque binary payload + declarative byte-feature " +
      "extraction (compiled BytePolyHash; codec decode stays stubbed in " +
      "Multimodal.decodeStub behind the mapPartitions variant)")

  // DuckDB replay of the deterministic sample-codebook IVF pipeline
  // (Similarity.collectCentroids + assignCells + 2-cell probe): shared CTE
  // prefix ending in `r` = (qid, neighbor, sim, rnk). Used by q29 (top-k),
  // q55 (recall vs brute force), q56 (top-k served from the lake index —
  // the index round-trip reproduces the in-session answer exactly).
  // Cell-assignment + probe-selection fragment (cent/asg/probes), shared
  // by the exact-IVF pipeline below and the IVF-PQ composition (q74).
  // assignment + probe selection given ANY `cent(cid, cv, cnrm)` CTE —
  // shared by the sample codebook (q29/q55/q56) and the Lloyd-trained
  // codebook (q54), which differ only in where `cent` comes from.
  private val duckIvfAssignTail =
    s"asg0 AS (SELECT n.vec_id, n.v, n.nrm, cent.cid, ${ddot("n.v", "cent.cv")}/(n.nrm*cent.cnrm) AS csim FROM n CROSS JOIN cent), " +
    "asg AS (SELECT vec_id, v, nrm, cid AS cell FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crn FROM asg0) WHERE crn = 1), " +
    s"pr0 AS (SELECT n.vec_id AS qid, n.v AS qv, n.nrm AS qnrm, cent.cid, ${ddot("n.v", "cent.cv")}/(n.nrm*cent.cnrm) AS csim FROM n CROSS JOIN cent WHERE n.vec_id % 10 = 0), " +
    "probes AS (SELECT qid, qv, qnrm, cid AS cell FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY csim DESC, cid) AS prn FROM pr0) WHERE prn <= 2)"

  /** The `cent` codebook CTE with a membership predicate — the 16
    * lowest vec_ids AMONG the rows satisfying `centPred`. `TRUE`
    * reproduces the whole-corpus sample codebook; q209 passes the base
    * slice so the oracle replays a codebook FROZEN before the appended
    * rows arrived. */
  private def duckIvfAssignPred(centPred: String) =
    s", cent AS (SELECT vec_id AS cid, v AS cv, cnrm FROM (SELECT vec_id, v, nrm AS cnrm FROM n WHERE $centPred ORDER BY vec_id LIMIT 16)), " +
    duckIvfAssignTail

  private val duckIvfAssign =
    // codebook = the 16 LOWEST vec_ids (matches Similarity.collectCentroids'
    // orderBy+limit, which stays correct for id spaces not starting at 0)
    duckIvfAssignPred("TRUE")

  // probed-cell brute force ending in `r` = (qid, neighbor, sim, rnk);
  // needs `probes` and `asg` in scope.
  private val duckIvfRankTail =
    ", top0 AS (SELECT p.qid, p.qv, p.qnrm, a.vec_id, a.v, a.nrm FROM probes p JOIN asg a ON p.cell = a.cell WHERE a.vec_id <> p.qid), " +
    s"top1 AS (SELECT qid, vec_id AS neighbor, ${ddot("qv", "v")}/(qnrm*nrm) AS sim FROM top0), " +
    "r AS (SELECT qid, neighbor, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor) AS rnk FROM top1)"

  private val duckIvf = duckEmb + duckIvfAssign + duckIvfRankTail

  // recall@5 epilogue: IVF ranks from `r` vs exact brute force over `n`
  // — shared by q55 (sample codebook) and q54 (Lloyd-trained codebook).
  private val duckRecallTail =
    ", ivf AS (SELECT qid, neighbor FROM r WHERE rnk <= 5), " +
    s"bf0 AS (SELECT q.vec_id AS qid, c.vec_id AS neighbor, ${ddot("q.v", "c.v")}/(q.nrm*c.nrm) AS sim " +
    "FROM n q, n c WHERE q.vec_id % 10 = 0 AND c.vec_id <> q.vec_id), " +
    "bf AS (SELECT qid, neighbor FROM (SELECT qid, neighbor, " +
    "row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor) AS rnk FROM bf0) WHERE rnk <= 5) " +
    "SELECT bf.qid, CAST(count(ivf.neighbor) AS DOUBLE)/5 AS recall " +
    "FROM bf LEFT JOIN ivf ON bf.qid = ivf.qid AND bf.neighbor = ivf.neighbor " +
    "GROUP BY bf.qid ORDER BY bf.qid"

  private val duckIvfTopK = duckIvf +
    " SELECT qid, rnk, neighbor, " + dround6("sim") + " AS sim " +
    "FROM r WHERE rnk <= 5 ORDER BY qid, rnk"

  private val q29 = Q(
    (s, dir) => Similarity.ivfTopK(table(s, dir, "embeddings"),
      col("vec_id") % 10 === 0, k = 5, nCells = 16, nProbe = 2),
    Some(duckIvfTopK),
    "IVF-bucketed approximate nearest neighbors (coarse quantizer + " +
      "2-cell probe), the scale path for q17's brute force")

  /** q54 oracle (VERDICT r15 #2 — the last rows-only row retired): the
    * Lloyd chain (kmeansOracle's training replay, k=16 cells over the
    * quantized corpus) feeds `cent` in double space (c/1e6 — exact in
    * IEEE double on both engines; cnrm = the same left-fold
    * sum-of-squares the engine computes), then the q55 assignment /
    * probe / rank / recall construction verbatim. */
  private def duckIvfTrainedRecall(rounds: Int): String = {
    val (chain, fin) = lloydChain(k = 16, rounds = rounds, dim = 64)
    duckEmb + ", " + chain.mkString(", ") +
      s", cw AS (SELECT cl AS cid, list_transform(c, x -> CAST(x AS DOUBLE)/1000000) AS cv FROM $fin), " +
      "cent AS (SELECT cid, cv, sqrt(list_reduce(list_transform(cv, x -> x*x), (a,b) -> a+b)) AS cnrm FROM cw), " +
      duckIvfAssignTail + duckIvfRankTail + duckRecallTail
  }

  // q54: ANN recall under a TRAINED coarse quantizer — graft's exact
  // fixed-point Lloyd's k-means (the q198 training loop, shared via
  // Clustering.lloydCentroidInts), so every step from training through
  // recall is SQL-replayed and hash-checked. The MLlib-codebook variant
  // (Similarity.ivfRecallAtK) stays spec-covered in SimilaritySpec; it
  // had no SQL twin, which kept this row rows-only through r15.
  private val q54 = Q(
    (s, dir) => {
      // trained codebook = ingest state (VERDICT r18 #5): the Lloyd
      // fixed point is a pure function of the embeddings source — train
      // first-touch under the source-fingerprint guard and serve the
      // recall from the stored integer centroids (bit-identical by
      // construction: the stored ints ARE the training output the
      // oracle replays; a changed source re-trains)
      val scratch = s"${Queries.scratchRoot}/q54-lloyd-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = table(s, dir, "embeddings")
      val fp = graft.io.Lake.sourceFingerprint(s, s"$dir/embeddings.parquet")
      val ints =
        if (graft.io.Lake.fingerprintCurrent(s, s"$scratch/_source_fp", fp))
          graft.ops.Clustering.readCentroidInts(s, s"$scratch/codebook_ints.tsv")
        else {
          val xs = graft.ops.Clustering.quantized(emb).persist()
          val trained = graft.ops.Clustering.lloydCentroidInts(xs, 16, 3)
          xs.unpersist()
          graft.ops.Clustering.writeCentroidInts(s,
            s"$scratch/codebook_ints.tsv", trained)
          graft.io.Lake.writeFingerprint(s, s"$scratch/_source_fp", fp)
          trained
        }
      Similarity.ivfRecallAtKFromCentroidInts(emb, ints,
        col("vec_id") % 10 === 0, k = 5, nProbe = 2)
    },
    Some(duckIvfTrainedRecall(rounds = 3)),
    "Recall@5 of the trained-codebook IVF ANN path (exact fixed-point " +
      "Lloyd's k-means coarse quantizer) vs exact brute force, per query " +
      "vector — training AND serving SQL-replayed end to end")

  /** q206 oracle: the full beam-search construction replayed — sample
    * codebook, EVERY node's probed-cell top-m neighbor graph, the
    * query set's IVF entry frontier (the shared `r` CTE, rnk ≤ beam),
    * `hops` unrolled expand/rescore/re-beam rounds, top-k over the
    * visited union, and the brute-force recall epilogue. Membership is
    * decided on unrounded doubles at every window, matching the
    * engine's (sim DESC, id ASC) contract. */
  private def duckBeamRecall(nProbe: Int, m: Int, beam: Int, hops: Int,
      k: Int, centPred: String = "TRUE"): String = {
    val p = Seq.newBuilder[String]
    // neighbor graph over every node's probed cells
    p += s"gp0 AS MATERIALIZED (SELECT n.vec_id AS src, n.v AS sv, n.nrm AS snrm, cent.cid, ${ddot("n.v", "cent.cv")}/(n.nrm*cent.cnrm) AS csim FROM n CROSS JOIN cent)"
    p += s"gprobes AS (SELECT src, sv, snrm, cid AS cell FROM (SELECT *, row_number() OVER (PARTITION BY src ORDER BY csim DESC, cid) AS prn FROM gp0) WHERE prn <= $nProbe)"
    p += "ge0 AS (SELECT p.src, p.sv, p.snrm, a.vec_id AS dst, a.v, a.nrm FROM gprobes p JOIN asg a ON p.cell = a.cell WHERE a.vec_id <> p.src)"
    p += s"ge1 AS (SELECT src, dst, ${ddot("sv", "v")}/(snrm*nrm) AS sim FROM ge0)"
    p += s"edges AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS rk FROM ge1) WHERE rk <= $m)"
    // entry frontier: the query set's IVF candidates (shared r CTE)
    p += s"b0 AS MATERIALIZED (SELECT qid, neighbor AS node FROM r WHERE rnk <= $beam)"
    var prev = "b0"
    (1 to hops).foreach { i =>
      p += s"c$i AS (SELECT DISTINCT qid, node FROM (SELECT qid, node FROM $prev " +
        s"UNION ALL SELECT b.qid, ed.dst AS node FROM $prev b JOIN edges ed ON b.node = ed.src) t " +
        "WHERE node <> qid)"
      p += s"s$i AS (SELECT c.qid, c.node, ${ddot("q.v", "x.v")}/(q.nrm*x.nrm) AS sim " +
        s"FROM c$i c JOIN n q ON q.vec_id = c.qid JOIN n x ON x.vec_id = c.node)"
      p += s"b$i AS MATERIALIZED (SELECT qid, node FROM (SELECT qid, node, " +
        s"row_number() OVER (PARTITION BY qid ORDER BY sim DESC, node) AS rk FROM s$i) WHERE rk <= $beam)"
      prev = s"b$i"
    }
    val visUnion = (0 to hops).map(i => s"SELECT qid, node FROM b$i")
      .mkString(" UNION ALL ")
    p += s"vis AS (SELECT DISTINCT qid, node FROM ($visUnion) u)"
    p += s"vsc AS (SELECT v.qid, v.node, ${ddot("q.v", "x.v")}/(q.nrm*x.nrm) AS sim " +
      "FROM vis v JOIN n q ON q.vec_id = v.qid JOIN n x ON x.vec_id = v.node)"
    p += s"vtop AS (SELECT qid, node FROM (SELECT qid, node, " +
      s"row_number() OVER (PARTITION BY qid ORDER BY sim DESC, node) AS rk FROM vsc) WHERE rk <= $k)"
    p += s"bf0 AS (SELECT q.vec_id AS qid, c.vec_id AS neighbor, ${ddot("q.v", "c.v")}/(q.nrm*c.nrm) AS sim " +
      "FROM n q, n c WHERE q.vec_id % 10 = 0 AND c.vec_id <> q.vec_id)"
    p += "bf AS (SELECT qid, neighbor FROM (SELECT qid, neighbor, " +
      s"row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor) AS rnk FROM bf0) WHERE rnk <= $k)"
    duckEmb + duckIvfAssignPred(centPred) + duckIvfRankTail + ", " +
      p.result().mkString(", ") +
      s" SELECT bf.qid, CAST(count(vt.node) AS DOUBLE)/$k AS recall " +
      "FROM bf LEFT JOIN vtop vt ON bf.qid = vt.qid AND bf.neighbor = vt.node " +
      "GROUP BY bf.qid ORDER BY bf.qid"
  }

  // q206: beam-search ANN over a navigable neighbor graph — the
  // recall/latency knob (HNSW's idea in one-layer set-oriented form;
  // VERDICT r15 #7c, the third #7 option): IVF entry, `hops` rounds of
  // expand-through-edges / rescore / keep-beam for ALL queries
  // simultaneously, recall@5 of the visited set vs brute force.
  private val q206 = Q(
    (s, dir) => Similarity.beamSearchRecallAtK(table(s, dir, "embeddings"),
      col("vec_id") % 10 === 0, k = 5, nCells = 16, nProbe = 2, m = 6,
      beam = 8, hops = 2),
    Some(duckBeamRecall(nProbe = 2, m = 6, beam = 8, hops = 2, k = 5)),
    "Beam-search ANN: top-m neighbor graph + IVF entry + 2 relational " +
      "expand/rescore/re-beam hops, recall@5 of the visited set vs " +
      "exact brute force — the graph-refined serving path whose beam " +
      "width is the recall/latency knob")

  // q208: q206's recall SERVED from the durable beam-graph index
  // (VERDICT r16 #3): the top-m neighbor graph — r16's per-session
  // cachedSingleton — becomes build-once lake state (src-bucketed
  // catalog table + the IVF entry index at a scratch path), the
  // q56/q75 convention applied to the hop structure. First-touch
  // build keyed by sf dir with a source fingerprint (q84 pattern);
  // the serve replays entry + hops + readout off the placed relations
  // and its recall rows equal q206's bit-for-bit (shared oracle).
  private val q208 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q208-index-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val tbl = "beam_graph_q208_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val fp = graft.io.Lake.sourceFingerprint(s, s"$dir/embeddings.parquet")
      if (!graft.io.Lake.exists(s, s"$scratch/assignment") ||
          !graft.io.Lake.fingerprintCurrent(s, s"$scratch/_source_fp", fp) ||
          !s.catalog.tableExists(tbl)) {
        Similarity.writeBeamGraphIndex(table(s, dir, "embeddings"), scratch,
          tbl, nCells = 16, nProbe = 2, m = 6)
        graft.io.Lake.writeFingerprint(s, s"$scratch/_source_fp", fp)
      }
      Similarity.beamSearchRecallAtKFromIndex(s, scratch, tbl,
        col("vec_id") % 10 === 0, k = 5, nProbe = 2, beam = 8, hops = 2)
    },
    q206.oracle,
    "Beam-search ANN served from the durable graph index: IVF entry " +
      "off the stored codebook (partition-pruned), hops over the " +
      "src-bucketed lake graph — same recall rows as q206's in-session " +
      "build, with the graph build prepaid at ingest")

  // q209: INCREMENTAL beam-graph maintenance (q208's append path — the
  // appendToIndex/appendToShingleIndex convention lifted to the hop
  // structure): the graph is built over the vec_id % 5 != 0 base, then
  // the % 5 == 0 arrivals APPEND — assigned under the frozen stored
  // codebook, given their own probed-cell top-m edges over the union,
  // and repairing exactly the old nodes whose probed cells they touch
  // (top-m(old list ∪ new candidates) = top-m(all candidates), the
  // top-k merge identity — so the appended graph is BIT-IDENTICAL to a
  // from-scratch rebuild with the same codebook, spec-proved). The
  // readout is q206's recall construction served from the appended
  // index; the oracle replays the whole thing with the codebook CTE
  // restricted to the base slice — the only semantic difference from
  // q206, which is precisely the frozen-codebook contract under test.
  private val q209 = Q(
    (s, dir) => {
      val mangled = dir.replaceAll("[^A-Za-z0-9]", "_")
      val scratch = s"${Queries.scratchRoot}/q209-index-base-$mangled"
      val runScratch = s"${Queries.scratchRoot}/q209-index-run"
      val tbl = "beam_graph_q209_" + mangled
      val runTbl = tbl + "_run"
      val emb = table(s, dir, "embeddings")
      val conf = s.sparkContext.hadoopConfiguration
      def wipe(p: String): Unit = {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).delete(hp, true)
      }
      // base graph + IVF state = ingest state, built first-touch under
      // the source-fingerprint guard (r19 — the q207/q210/q214
      // convention; the run times the MAINTENANCE: the arrivals append
      // and the recall serve, which is the operator under test)
      val fp = graft.io.Lake.sourceFingerprint(s, s"$dir/embeddings.parquet")
      if (!s.catalog.tableExists(tbl) ||
          !graft.io.Lake.fingerprintCurrent(s, s"$scratch/_source_fp", fp)) {
        wipe(scratch)
        Similarity.writeBeamGraphIndex(emb.filter(col("vec_id") % 5 =!= 0),
          scratch, tbl, nCells = 16, nProbe = 2, m = 6)
        graft.io.Lake.writeFingerprint(s, s"$scratch/_source_fp", fp)
      }
      // the append mutates the IVF assignment (new vectors land in their
      // cell dirs) — run it against a per-run copy of the index dir, and
      // publish the merged graph into a run-local table (bucket-level,
      // so only touched buckets stage; the pristine base never mutates)
      wipe(runScratch)
      val sp = new org.apache.hadoop.fs.Path(scratch)
      org.apache.hadoop.fs.FileUtil.copy(sp.getFileSystem(conf), sp,
        sp.getFileSystem(conf), new org.apache.hadoop.fs.Path(runScratch),
        false, conf)
      Similarity.appendToBeamGraphIndex(emb.filter(col("vec_id") % 5 === 0),
        runScratch, tbl, into = runTbl)
      Similarity.beamSearchRecallAtKFromIndex(s, runScratch, runTbl,
        col("vec_id") % 10 === 0, k = 5, nProbe = 2, beam = 8, hops = 2)
    },
    Some(duckBeamRecall(nProbe = 2, m = 6, beam = 8, hops = 2, k = 5,
      centPred = "vec_id % 5 <> 0")),
    "Incremental beam-graph maintenance: arrivals append under the " +
      "frozen codebook — own probed-cell edges plus exact repair of " +
      "the old nodes they touch — and the appended graph serves q206's " +
      "recall bit-identical to a same-codebook rebuild")

  // q212: HARD-NEGATIVE mining from the durable IVF index — the
  // contrastive-training-pair op (DPR/SimCSE shape): per query, the 5
  // hardest probed-cell candidates whose exact cosine lands in
  // [0.2, 0.4) — confusable (above the easy floor) but not near-dups
  // (0.4 is q23's dedup bar; a near-dup is a false negative). Plan is
  // exactly the q56/q107 IVF serve with the band filtered on the
  // UNROUNDED sim before ranking: mining negatives costs one serve,
  // no extra corpus pass — the candidate generator IS the index.
  private val q212 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q212-index-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      graft.functions.CatalystExpressions.register(s)
      val fp = graft.io.Lake.sourceFingerprint(s, s"$dir/embeddings.parquet")
      if (!graft.io.Lake.exists(s, s"$scratch/assignment") ||
          !graft.io.Lake.fingerprintCurrent(s, s"$scratch/_source_fp", fp)) {
        Similarity.writeIndex(table(s, dir, "embeddings"), scratch, nCells = 16)
        graft.io.Lake.writeFingerprint(s, s"$scratch/_source_fp", fp)
      }
      // bulk serve (queries = 10% of the corpus): pruneScan=false per
      // the q107 RrfProbe finding — the probed-cell union covers every
      // cell, so the pruning job would prune nothing
      Similarity.ivfHardNegativesFromIndex(s, scratch,
        col("vec_id") % 10 === 0, k = 5, nProbe = 2, lo = 0.2, hi = 0.4,
        pruneScan = false)
    },
    Some(duckIvf +
      ", hb AS (SELECT qid, neighbor, sim, row_number() OVER " +
      "(PARTITION BY qid ORDER BY sim DESC, neighbor) AS rnk FROM top1 " +
      "WHERE sim >= 0.2 AND sim < 0.4) " +
      "SELECT qid, CAST(rnk AS BIGINT) AS rnk, neighbor, " +
      dround6("sim") + " AS sim FROM hb WHERE rnk <= 5 ORDER BY qid, rnk"),
    "Hard-negative mining off the durable IVF index: per query the 5 " +
      "hardest candidates in the [0.2, 0.4) cosine band — confusable " +
      "but not near-dup, the contrastive-training-pair generator at " +
      "one serve's cost")

  // q216: CLUSTER-BALANCED curation — the diversity-aware selection
  // step (the SemDeDup-paper companion move: dedup removes redundancy,
  // cluster-balanced sampling keeps COVERAGE): assign every document's
  // embedding to its IVF cell, keep the top-10 docs per cell by text
  // quality. Crosses the two modalities the engine already serves —
  // embedding geometry picks the strata, text quality ranks within —
  // via the salted two-phase top-k (q67's operator), so no single-task
  // cell sort at 100 TB. doc_id and vec_id share the id space
  // (TESTDATA: one embedding per document; the q107 contract).
  private val q216 = Q(
    (s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.TextAnalysis.qualityScore(col("text")).as("score"))
      val cells = Similarity.cellAssignments(
        table(s, dir, "embeddings"), nCells = 16)
      val joined = cells.join(docs,
        cells("vec_id") === docs("doc_id")).drop("vec_id")
      graft.ops.Curation.capPerGroup(joined, "cell", "doc_id",
          col("score"), k = 10)
        .select(col("cell"), col("rnk"), col("doc_id"), col("score"))
        .orderBy("cell", "rnk")
    },
    Some(Queries.duckEmb + duckIvfAssign +
      ", sc AS (SELECT a.cell, d.doc_id, " + Queries.duckQualityScore +
      " AS score FROM asg a JOIN documents d ON d.doc_id = a.vec_id), " +
      "r AS (SELECT cell, doc_id, score, CAST(row_number() OVER " +
      "(PARTITION BY cell ORDER BY score DESC, doc_id) AS BIGINT) AS rnk " +
      "FROM sc) " +
      "SELECT cell, rnk, doc_id, score FROM r WHERE rnk <= 10 " +
      "ORDER BY cell, rnk"),
    "Cluster-balanced curation: top-10 docs per embedding cluster by " +
      "text quality — geometry picks the strata, quality ranks within; " +
      "the coverage-preserving selection that complements dedup")

  // q55: the same recall metric over the deterministic sample codebook —
  // the zero-training member of the recall family (q54 trains its cells).
  private val q55 = Q(
    (s, dir) => Similarity.ivfRecallAtKSample(table(s, dir, "embeddings"),
      col("vec_id") % 10 === 0, k = 5, nCells = 16, nProbe = 2),
    Some(duckIvf + duckRecallTail),
    "Recall@5 of the sample-codebook IVF path vs exact brute force — the " +
      "zero-training ANN quality metric (q54 is the trained-codebook " +
      "member)")

  // q56/q57: the durable-index round trip (q05-style write+read). The
  // index is built to scratch each run — partitioned assignment + codebook
  // sidecar — then served back with the scan pruned to probed/admissible
  // cells. Results equal the in-session q29/q23 answers, so they share
  // those oracles (which do not perform the write).
  private val q56 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q56-index"
      Similarity.writeIndex(table(s, dir, "embeddings"), scratch, nCells = 16)
      Similarity.ivfTopKFromIndex(s, scratch, col("vec_id") % 10 === 0,
        k = 5, nProbe = 2)
    },
    Some(duckIvfTopK),
    "Durable-index ANN round trip: IVF assignment written to the lake " +
      "partitioned by cell (+ codebook sidecar), top-k served from the " +
      "index with the corpus scan partition-pruned to probed cells")

  private val q57 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q57-index"
      Similarity.writeIndex(table(s, dir, "embeddings"), scratch, nCells = 16)
      Similarity.cosinePairsBlockedFromIndex(s, scratch, threshold = 0.4)
    },
    Some(duckEmb + " SELECT q.vec_id AS ida, c.vec_id AS idb, " +
      dround6(s"${ddot("q.v", "c.v")} / (q.nrm * c.nrm)") + " AS sim " +
      "FROM n q JOIN n c ON q.vec_id < c.vec_id " +
      s"WHERE ${ddot("q.v", "c.v")} / (q.nrm * c.nrm) >= 0.4 ORDER BY ida, idb"),
    "Durable-index near-dup round trip: cosine pairs served from the lake " +
      "index, scan pruned to admissible cells — same pair set as q23")

  // q58/q59: the durable shingle/LSH index (q05-style write+read). q58
  // serves the FULL pair search from the lake index — same answer as q20,
  // so it shares q20's exact-Jaccard oracle. q59 is the incremental path:
  // docs with doc_id % 7 = 0 arrive as the "new" batch against an index
  // of the rest; the oracle is the exact pair set where at least one side
  // is new (LSH candidates lossless at j >= 0.8, exact verify).
  private val q58 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q58-index"
      Dedup.writeShingleIndex(table(s, dir, "documents"), scratch)
      Dedup.minhashNearDupsFromIndex(s, scratch, threshold = 0.8)
    },
    q20.oracle,
    "Durable dedup-index round trip: shingles + LSH posting lists written " +
      "to the lake (bands band-sorted, AQE-sized files), full near-dup search served with " +
      "no signature recomputation — same pair set as q20")

  private val q59 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q59-index"
      val docs = table(s, dir, "documents")
      Dedup.writeShingleIndex(docs.filter(col("doc_id") % 7 =!= 0), scratch)
      Dedup.minhashNearDupsAgainstIndex(s, docs.filter(col("doc_id") % 7 === 0),
        scratch, threshold = 0.8)
    },
    Some(duckWordShingles +
      ", c AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter " +
      "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id " +
      "WHERE a.doc_id % 7 = 0 OR b.doc_id % 7 = 0 GROUP BY 1, 2), " +
      "z AS (SELECT doc_id, count(*) AS nsh FROM s GROUP BY 1) " +
      "SELECT da, db, " + dround6("CAST(inter AS DOUBLE)/(x.nsh + y.nsh - inter)") + " AS jac " +
      "FROM c JOIN z x ON c.da = x.doc_id JOIN z y ON c.db = y.doc_id " +
      "WHERE CAST(inter AS DOUBLE)/(x.nsh + y.nsh - inter) >= 0.8 ORDER BY da, db"),
    "Incremental dedup against the durable index: a new batch (doc_id%7=0) " +
      "is shingled/banded with the index's stored parameters and joined " +
      "against the lake posting lists — the corpus is never recomputed")

  // q61: incremental dedup-index maintenance (the Dedup twin of q60).
  // Index built on doc_id % 7 != 0, the rest APPENDED with the stored
  // parameters, full pair search served from the combined tables — same
  // answer as q20's from-scratch search, so it shares q20's oracle.
  private val q61 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q61-index"
      val docs = table(s, dir, "documents")
      Dedup.writeShingleIndex(docs.filter(col("doc_id") % 7 =!= 0), scratch)
      Dedup.appendToShingleIndex(docs.filter(col("doc_id") % 7 === 0), scratch)
      Dedup.minhashNearDupsFromIndex(s, scratch, threshold = 0.8)
    },
    q20.oracle,
    "Incremental dedup-index append: new documents shingled/banded with " +
      "the stored parameters and appended partition-wise; the served pair " +
      "set equals the from-scratch q20 answer")

  // q62/q63: the step after pair detection — group near-dup pairs into
  // clusters (connected components) and keep one representative per
  // cluster. The oracle replays min-label clustering as a recursive CTE
  // (reachability, then min over the reachable set) over q20's exact
  // pair set, which the Spark side computes by iterative min-label
  // propagation — same fixpoint, provably: both equal "min id reachable".
  private val duckNearDupEdges = duckWordShingles.replaceFirst("WITH ", "WITH RECURSIVE ") +
    ", c AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter " +
    "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
    "z AS (SELECT doc_id, count(*) AS nsh FROM s GROUP BY 1), " +
    "p AS (SELECT da, db FROM c JOIN z x ON c.da = x.doc_id " +
    "JOIN z y ON c.db = y.doc_id " +
    "WHERE CAST(inter AS DOUBLE)/(x.nsh + y.nsh - inter) >= 0.8), " +
    "e AS (SELECT da AS src, db AS dst FROM p " +
    "UNION ALL SELECT db AS src, da AS dst FROM p), " +
    "r AS (SELECT src AS id, dst AS lbl FROM e " +
    "UNION SELECT r.id, e.dst FROM r JOIN e ON r.lbl = e.src), " +
    "comp AS (SELECT id, least(id, min(lbl)) AS cluster FROM r GROUP BY id)"

  private val q62 = Q(
    (s, dir) => {
      val pairs = Dedup.minhashNearDups(table(s, dir, "documents"), "doc_id",
        "text", shingleWidth = 3, k = 128, bands = 32, threshold = 0.8)
      Dedup.connectedComponents(pairs)
        .select(col("id"), col("lbl").as("cluster"))
        .orderBy("id")
    },
    Some(duckNearDupEdges + " SELECT id, cluster FROM comp ORDER BY id"),
    "Near-dup clustering: connected components over the q20 pair set by " +
      "iterative min-label propagation — cluster = min reachable id")

  private val q63 = Q(
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleWidth = 3, k = 128, bands = 32, threshold = 0.8)
      Dedup.dedupSurvivors(docs, "doc_id", pairs)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")
    },
    Some(duckNearDupEdges +
      " SELECT lang, count(*) AS n_docs FROM documents " +
      "WHERE doc_id NOT IN (SELECT id FROM comp WHERE cluster <> id) " +
      "GROUP BY lang ORDER BY lang"),
    "Deduplicated-corpus survivor counts: drop non-representative cluster " +
      "members (keep each cluster's min id + all unpaired docs)")

  // q142: INCREMENTAL clustering serve — the steady-state loop a 100-TB
  // dedup pipeline actually runs per ingest batch: the prior labeling +
  // the old corpus's shingle index are ingest-time artifacts (first
  // touch, source-fingerprinted); the timed region is the NEW batch
  // only — pairs against the index (q59's path), then
  // incrementalComponents merges them into the prior labeling over
  // |corpus| label edges + |batch| pairs, never re-clustering the
  // corpus. Shares q62's full recursive-CTE oracle: the equivalence
  // CC(labelEdges ∪ newPairs) = CC(allPairs) is hash-proved on the
  // real corpus.
  private val q142 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q142-inc-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val docs = table(s, dir, "documents")
      val isNew = pmod(col("doc_id"), lit(10)) === 3
      val fp = graft.io.Lake.sourceFingerprint(s, s"$dir/documents.parquet")
      if (!graft.io.Lake.exists(s, s"$scratch/labels") ||
          !graft.io.Lake.fingerprintCurrent(s, s"$scratch/_source_fp", fp)) {
        val old = docs.filter(!isNew)
        Dedup.writeShingleIndex(old, s"$scratch/index")
        val prior = Dedup.connectedComponents(
          Dedup.minhashNearDupsFromIndex(s, s"$scratch/index", threshold = 0.8))
        old.select(col("doc_id").as("id"))
          .join(prior, Seq("id"), "left")
          .select(col("id"), coalesce(col("lbl"), col("id")).as("lbl"))
          .write.mode("overwrite").parquet(s"$scratch/labels")
        graft.io.Lake.writeFingerprint(s, s"$scratch/_source_fp", fp)
      }
      val touch = Dedup.minhashNearDupsAgainstIndex(s, docs.filter(isNew),
        s"$scratch/index")
      Dedup.incrementalComponents(s.read.parquet(s"$scratch/labels"), touch,
          keepSingletons = false)
        .select(col("id"), col("lbl").as("cluster"))
        .orderBy("id")
    },
    q62.oracle,
    "Incremental near-dup clustering: a new batch's pairs (served from " +
      "the durable index) merged into the prior labeling via label-edge " +
      "propagation — no corpus re-cluster, hash-equal to from-scratch " +
      "components over all pairs")

  // q84: the end-to-end production dedup loop served from the durable
  // index — pairs from the lake posting lists, clusters, survivors, with
  // ZERO signature recomputation in steady state. The index is built on
  // first touch (keyed by sf dir so a stale index from another scale
  // factor can never serve) and every later run is serve-only: that is
  // the shape a 100-TB corpus runs — documents are admitted through
  // appendToShingleIndex / StreamSink.toShingleIndex at ingest, and the
  // periodic dedup sweep reads only the index tables. Same answer as
  // q63's in-session pipeline, so it shares q63's oracle.
  private val q84 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q84-index-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val docs = table(s, dir, "documents")
      // source fingerprint (r12 watch item, q119 pattern): the scratch
      // index persists across processes, so a regenerated documents
      // table must trigger a rebuild, not serve stale postings
      val fp = graft.io.Lake.sourceFingerprint(s, s"$dir/documents.parquet")
      if (!graft.io.Lake.exists(s, s"$scratch/shingles") ||
          !graft.io.Lake.fingerprintCurrent(s, s"$scratch/_source_fp", fp)) {
        Dedup.writeShingleIndex(docs, scratch)
        graft.io.Lake.writeFingerprint(s, s"$scratch/_source_fp", fp)
      }
      Dedup.dedupSurvivorsFromIndex(s, docs, "doc_id", scratch, threshold = 0.8)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")
    },
    q63.oracle,
    "Corpus dedup served from the durable shingle index: posting-list " +
      "pairs, connected components, survivor counts — the ingest-time " +
      "index amortizes the shingle/signature pass to zero in steady state")

  // q85: semantic dedup (SemDeDup) served from the durable IVF index —
  // the embedding-space twin of q84. Pairs come from the lake assignment
  // (exact set, lossless cell blocking), clusters from connected
  // components, one representative kept per cluster; survivors counted
  // by label. Index built on first touch (keyed by sf dir), serve-only
  // afterwards. The oracle replays the loop as a recursive CTE over the
  // brute-force cosine pair set at the same threshold (q23/q57's pair
  // set), so the whole embedding-side loop is hash-checked.
  private val q85 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q85-index-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = table(s, dir, "embeddings")
      // source fingerprint (r12 watch item, q119 pattern)
      val fp = graft.io.Lake.sourceFingerprint(s, s"$dir/embeddings.parquet")
      if (!graft.io.Lake.exists(s, s"$scratch/assignment") ||
          !graft.io.Lake.fingerprintCurrent(s, s"$scratch/_source_fp", fp)) {
        Similarity.writeIndex(emb, scratch, nCells = 16)
        graft.io.Lake.writeFingerprint(s, s"$scratch/_source_fp", fp)
      }
      Similarity.semanticDedupSurvivorsFromIndex(s, emb, "vec_id", scratch,
        threshold = 0.4)
        .groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
        .orderBy("label")
    },
    // MATERIALIZED on the pair CTEs: without it DuckDB re-evaluates the
    // brute-force O(n^2) cosine join on EVERY recursive-closure iteration
    // (measured 69 s vs 2.5 s at sf0.1 for an identical result) — the
    // hint keeps the baseline measuring the dedup loop, not a CTE
    // re-evaluation pathology.
    Some(duckEmb.replaceFirst("WITH ", "WITH RECURSIVE ") +
      ", p AS MATERIALIZED (SELECT q.vec_id AS da, c.vec_id AS db " +
      "FROM n q JOIN n c ON q.vec_id < c.vec_id " +
      s"WHERE ${ddot("q.v", "c.v")} / (q.nrm * c.nrm) >= 0.4), " +
      "ed AS MATERIALIZED (SELECT da AS src, db AS dst FROM p " +
      "UNION ALL SELECT db AS src, da AS dst FROM p), " +
      "r AS (SELECT src AS id, dst AS lbl FROM ed " +
      "UNION SELECT r.id, ed.dst FROM r JOIN ed ON r.lbl = ed.src), " +
      "comp AS (SELECT id, least(id, min(lbl)) AS cluster FROM r GROUP BY id) " +
      "SELECT label, count(*) AS n_vecs FROM embeddings " +
      "WHERE vec_id NOT IN (SELECT id FROM comp WHERE cluster <> id) " +
      "GROUP BY label ORDER BY label"),
    "Semantic dedup served from the durable IVF index: exact cosine " +
      "pairs from the lake assignment, connected components, one " +
      "representative per cluster — the SemDeDup sweep with zero " +
      "embedding recomputation in steady state")

  // q64: Gopher/C4-style repetition quality signals. The duplicate-gram
  // fraction is pure in-row arithmetic over the compiled shingle set;
  // the top-word share is the explode + two-keyed-agg shape. Both
  // replayed exactly by the oracle.
  private val q64 = Q(
    (s, dir) => TextAnalysis.repetitionSignals(table(s, dir, "documents"),
        "doc_id", "text", n = 2)
      .orderBy("doc_id"),
    Some("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
      "rep AS (SELECT doc_id, CASE WHEN greatest(len(ws)-1, 0) = 0 THEN 0.0 ELSE " +
      dround6("CAST(greatest(len(ws)-1, 0) - " +
        s"len(list_distinct(${Queries.duckWordGramsList("ws", 2)})) AS DOUBLE)" +
        " / greatest(len(ws)-1, 0)") +
      " END AS rep_gram_frac FROM w), " +
      "wc AS (SELECT doc_id, x.w AS w, count(*) AS c FROM " +
      "(SELECT doc_id, unnest(ws) AS w FROM w) x GROUP BY 1, 2), " +
      "tw AS (SELECT doc_id, " + dround6("CAST(max(c) AS DOUBLE)/sum(c)") +
      " AS top_word_frac FROM wc GROUP BY doc_id) " +
      "SELECT r.doc_id AS doc_id, rep_gram_frac, top_word_frac FROM rep r " +
      "JOIN tw t ON r.doc_id = t.doc_id ORDER BY r.doc_id"),
    "Repetition quality signals: duplicate word-2gram fraction (in-row) " +
      "and top-word share (explode + keyed aggs) — the Gopher-style " +
      "boilerplate/degeneracy filters")

  // q66: PII scrubbing. The synthetic corpus carries no PII, so the query
  // APPENDS a deterministic email + NANP phone derived from doc_id before
  // detecting/redacting — the oracle replays the augmentation, so counts
  // and the redacted-text fingerprint are non-trivially hash-checked
  // (every doc must count exactly its own injected PII and nothing else).
  private val q66 = Q(
    (s, dir) => {
      val aug = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail.example.com or +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
      TextAnalysis.redactPii(
          table(s, dir, "documents").withColumn("text", aug))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          graft.functions.TextFunctions.polyHash(col("redacted")).as("redacted_fp"))
        .orderBy("doc_id")
    },
    Some("WITH aug AS (SELECT doc_id, text || ' contact user' || " +
      "CAST(doc_id AS VARCHAR) || '@mail.example.com or +1-555-' || " +
      "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t FROM documents), " +
      "red AS (SELECT doc_id, " +
      s"len(regexp_extract_all(t, '${TextAnalysis.emailPattern}')) AS n_emails, " +
      s"len(regexp_extract_all(t, '${TextAnalysis.phonePattern}')) AS n_phones, " +
      s"regexp_replace(regexp_replace(t, '${TextAnalysis.emailPattern}', '<EMAIL>', 'g'), " +
      s"'${TextAnalysis.phonePattern}', '<PHONE>', 'g') AS r FROM aug) " +
      s"SELECT doc_id, n_emails, n_phones, ${duckCharFoldOf("r")} AS redacted_fp " +
      "FROM red ORDER BY doc_id"),
    "PII detection + redaction (email / phone regex, common Java+RE2 " +
      "syntax subset): per-doc match counts and redacted-text fingerprint " +
      "over deterministically injected PII")

  // q68: SRP (random-hyperplane) LSH near-dup pairs — the cosine twin of
  // q20's MinHash banding. Hyperplanes are the first-16 deterministic
  // sample vectors, so the oracle replays signature -> banding -> exact
  // verify bit-for-bit (both sides fold the same doubles left-to-right).
  // Approximate BY DESIGN (banded recall < 1); the hash check pins the
  // banded answer itself.
  private val q68 = Q(
    (s, dir) => Similarity.srpNearDups(table(s, dir, "embeddings"),
      threshold = 0.4, nBits = 16, bandBits = 4),
    Some(Queries.duckEmb +
      ", hp AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS hid, v AS h " +
      "FROM (SELECT vec_id, v FROM n WHERE nrm > 0 ORDER BY vec_id LIMIT 16)), " +
      "bits AS (SELECT n.vec_id, hp.hid // 4 AS band, " +
      s"(CASE WHEN ${Queries.ddot("n.v", "hp.h")} > 0 THEN CAST(1 AS BIGINT) " +
      "ELSE CAST(0 AS BIGINT) END << (hp.hid % 4)) AS bitval " +
      "FROM n, hp WHERE n.nrm > 0), " +
      "bands AS (SELECT vec_id, band, CAST(sum(bitval) AS BIGINT) AS key " +
      "FROM bits GROUP BY 1, 2), " +
      "cand AS (SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb FROM bands a " +
      "JOIN bands b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id), " +
      "p AS (SELECT ida, idb, " + Queries.ddot("x.v", "y.v") + "/(x.nrm*y.nrm) AS sim " +
      "FROM cand JOIN n x ON ida = x.vec_id JOIN n y ON idb = y.vec_id) " +
      "SELECT ida, idb, " + Queries.dround6("sim") + " AS sim FROM p " +
      "WHERE sim >= 0.4 ORDER BY ida, idb"),
    "SRP hyperplane-LSH near-dup pairs (16-bit signature, 4x4-bit bands, " +
      "exact cosine >= 0.4 verify) — deterministic sample hyperplanes, " +
      "fully SQL-replayable")

  // q70: chunk-granularity exact dedup — repeated-passage detection via
  // non-overlapping 3-word tiles (boilerplate that document-level dedup
  // misses). Output is the duplicated-chunk inventory.
  private val q70 = Q(
    (s, dir) => Dedup.chunkExactDups(table(s, dir, "documents"),
        "doc_id", "text", width = 3)
      .orderBy("chunk"),
    Some("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
      "c AS (SELECT doc_id, unnest(list_transform(range(len(ws)//3), " +
      "i -> array_to_string(ws[i*3+1:i*3+3], ' '))) AS chunk FROM w) " +
      "SELECT chunk, count(DISTINCT doc_id) AS n_docs, " +
      "count(*) AS n_occurrences FROM c GROUP BY chunk " +
      "HAVING count(DISTINCT doc_id) > 1 ORDER BY chunk"),
    "Exact substring-level dedup: non-overlapping word-chunk tiling, " +
      "chunks shared across documents (repeated-passage / boilerplate " +
      "inventory)")

  // q71: product-quantization ANN. Every stage — unit normalization,
  // per-subspace sample codebooks, argmin encoding, ADC table lookups,
  // the fold order of every distance sum — is replayed by the oracle, so
  // the approximate answer itself is hash-checked end to end.
  // PQ fragment (normalize/codebook/encode/query-tables), shared by flat
  // PQ (q71) and the IVF-PQ composition (q74). Continues from duckEmb's
  // `n`; yields `encl` (vec_id, codes) and `qtl` (qid, tabs).
  private val duckPq =
    ", nh AS (SELECT vec_id, list_transform(v, x -> x/nrm) AS vh FROM n WHERE nrm > 0), " +
    "pcb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, vh AS cv " +
    "FROM (SELECT vec_id, vh FROM nh ORDER BY vec_id LIMIT 16)), " +
    "dva AS (SELECT nh.vec_id, sub.j, pcb.cid, " +
    "list_reduce(list_transform(list_zip(nh.vh[sub.j*8+1:sub.j*8+8], " +
    "pcb.cv[sub.j*8+1:sub.j*8+8]), t -> (t[1]-t[2])*(t[1]-t[2])), (a,b) -> a+b) AS dist " +
    "FROM nh, (SELECT unnest(range(8)) AS j) sub, pcb), " +
    "enc0 AS (SELECT vec_id, j, cid, row_number() OVER " +
    "(PARTITION BY vec_id, j ORDER BY dist, cid) AS rn FROM dva), " +
    "encl AS (SELECT vec_id, list(cid ORDER BY j) AS codes FROM enc0 " +
    "WHERE rn = 1 GROUP BY vec_id), " +
    "qt AS (SELECT vec_id AS qid, j, list(dist ORDER BY cid) AS tab FROM dva " +
    "WHERE vec_id % 10 = 0 GROUP BY vec_id, j), " +
    "qtl AS (SELECT qid, list(tab ORDER BY j) AS tabs FROM qt GROUP BY qid)"

  // ADC distance + rank over a candidate set `cand` (qid, neighbor).
  private def duckAdcRank(cand: String) =
    s", p AS (SELECT t.qid, t.neighbor, " +
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
    "list_transform(range(8), j -> q.tabs[j+1][c.codes[j+1]+1])), (a,b) -> a+b) AS adist " +
    s"FROM $cand t JOIN encl c ON t.neighbor = c.vec_id JOIN qtl q ON t.qid = q.qid), " +
    "r AS (SELECT qid, neighbor, adist, CAST(row_number() OVER " +
    "(PARTITION BY qid ORDER BY adist, neighbor) AS BIGINT) AS rnk FROM p) " +
    "SELECT qid, rnk, neighbor, " + Queries.dround6("adist") + " AS adist " +
    "FROM r WHERE rnk <= 5 ORDER BY qid, rnk"

  private val q71 = Q(
    (s, dir) => Similarity.pqTopK(table(s, dir, "embeddings"),
      col("vec_id") % 10 === 0, k = 5, m = 8, ks = 16),
    Some(Queries.duckEmb + duckPq +
      ", cand AS (SELECT q.qid, c.vec_id AS neighbor FROM encl c, qtl q " +
      "WHERE c.vec_id <> q.qid)" +
      duckAdcRank("cand")),
    "Product-quantization approximate k-NN (8 subspaces x 16 " +
      "sub-centroids, ADC lookup-table scan) — the 32x memory-compression " +
      "path for embedding search; unit-normalized so ADC ranks like cosine")

  // q74: the IVF-PQ composition — q29's cell pruning carrying q71's
  // codes. Both codebooks deterministic samples, so the full two-stage
  // pipeline (coarse probe -> in-cell ADC) is hash-checked end to end.
  private val q74 = Q(
    (s, dir) => Similarity.ivfPqTopK(table(s, dir, "embeddings"),
      col("vec_id") % 10 === 0, k = 5, nCells = 16, nProbe = 2, m = 8, ks = 16),
    Some(Queries.duckEmb + duckIvfAssign + duckPq +
      ", cand AS (SELECT p.qid, a.vec_id AS neighbor FROM probes p " +
      "JOIN asg a ON p.cell = a.cell WHERE a.vec_id <> p.qid)" +
      duckAdcRank("cand")),
    "IVF-PQ approximate k-NN: coarse 2-cell probe pruning the scan, " +
      "m-lookup ADC inside the probed cells — the production ANN " +
      "composition (index stores cell + codes; full vectors needed at " +
      "index time only)")

  // q75: the durable IVF-PQ round trip — closes "PQ is the variant that
  // exists because vectors don't fit memory, yet was the one still
  // session-only". The index is built to scratch — (vec_id, codes)
  // partitioned by cell plus both codebook sidecars — then served for
  // q74's query set with the corpus scan pruned to probed cells and NO
  // raw-vector access (the serve plan reads only (vec_id, codes, cell);
  // SimilaritySpec asserts this on the physical plan). Same answer as the
  // in-session q74, so it shares q74's oracle, which does not perform the
  // write — the same measured asymmetry class as q56-q61.
  private val q75 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q75-pq-index"
      val emb = table(s, dir, "embeddings")
      Similarity.writePqIndex(emb, scratch, nCells = 16, m = 8, ks = 16)
      Similarity.ivfPqTopKFromIndexFor(s, scratch,
        emb.filter(col("vec_id") % 10 === 0), k = 5, nProbe = 2)
    },
    q74.oracle,
    "Durable IVF-PQ round trip: (cell, codes) written to the lake + both " +
      "codebook sidecars, ADC top-k served partition-pruned with no " +
      "raw-vector access — full vectors needed at index time only")

  /** ADC shortlist CTE (`sr` = top-`r` per qid by ADC distance over a
    * candidate CTE) — [[duckAdcRank]]'s scoring without the final
    * readout, feeding q215's exact re-rank. */
  private def duckAdcShortlist(cand: String, r: Int) =
    s", p2 AS (SELECT t.qid, t.neighbor, " +
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
    "list_transform(range(8), j -> q.tabs[j+1][c.codes[j+1]+1])), (a,b) -> a+b) AS adist " +
    s"FROM $cand t JOIN encl c ON t.neighbor = c.vec_id JOIN qtl q ON t.qid = q.qid), " +
    "sr AS (SELECT qid, neighbor FROM (SELECT qid, neighbor, " +
    "row_number() OVER (PARTITION BY qid ORDER BY adist, neighbor) AS rnk " +
    s"FROM p2) WHERE rnk <= $r)"

  // q215: two-stage PQ serving — ADC shortlist (r=25), EXACT re-rank
  // (the IVFADC+R production shape): stage 1 is q74's compressed-domain
  // scan, stage 2 fetches true vectors for only the shortlist rows and
  // re-ranks by exact cosine. `r` is the single knob trading ADC
  // quantization error against raw-vector fetches; with r = corpus the
  // re-rank degenerates bit-equal to plain exact IVF (spec-asserted).
  private val q215 = Q(
    (s, dir) => Similarity.ivfPqRerank(table(s, dir, "embeddings"),
      col("vec_id") % 10 === 0, k = 5, r = 25, nCells = 16, nProbe = 2,
      m = 8, ks = 16),
    Some(Queries.duckEmb + duckIvfAssign + duckPq +
      ", cand AS (SELECT p.qid, a.vec_id AS neighbor FROM probes p " +
      "JOIN asg a ON p.cell = a.cell WHERE a.vec_id <> p.qid)" +
      duckAdcShortlist("cand", r = 25) +
      s", ex AS (SELECT sr.qid, sr.neighbor, ${ddot("q.v", "c.v")}/(q.nrm*c.nrm) AS sim " +
      "FROM sr JOIN n q ON q.vec_id = sr.qid JOIN n c ON c.vec_id = sr.neighbor), " +
      "fr AS (SELECT qid, neighbor, sim, CAST(row_number() OVER " +
      "(PARTITION BY qid ORDER BY sim DESC, neighbor) AS BIGINT) AS rnk FROM ex) " +
      "SELECT qid, rnk, neighbor, " + dround6("sim") + " AS sim " +
      "FROM fr WHERE rnk <= 5 ORDER BY qid, rnk"),
    "Two-stage PQ serving: in-cell ADC shortlist (top-25), exact-cosine " +
      "re-rank of only the shortlist — the IVFADC+R repair for ADC " +
      "quantization error at a bounded raw-vector-fetch cost")

  // q73: corpus-statistics LM quality score. Mean bigram probability
  // instead of log-perplexity ON PURPOSE: ln() is not bit-portable
  // across engines, +,x,/ are — and the per-doc sum folds a
  // position-sorted list so the double addition has one deterministic
  // order on both sides.
  private val q73 = Q(
    (s, dir) => TextAnalysis.bigramLmScore(table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
      "g0 AS (SELECT doc_id, unnest([{'pos': i, 'bg': ws[i]||' '||ws[i+1], 'w1': ws[i]} " +
      "FOR i IN generate_series(1, greatest(len(ws)-1, 0))]) AS s FROM w), " +
      "g AS (SELECT doc_id, s.pos AS pos, s.bg AS bg, s.w1 AS w1 FROM g0), " +
      "c2 AS (SELECT bg, count(*) AS cnt2 FROM g GROUP BY bg), " +
      "c1 AS (SELECT w1, count(*) AS cnt1 FROM g GROUP BY w1), " +
      "p AS (SELECT doc_id, pos, CAST(cnt2 AS DOUBLE)/cnt1 AS prob " +
      "FROM g JOIN c2 USING (bg) JOIN c1 USING (w1)), " +
      "sc AS (SELECT doc_id, count(*) AS n_bigrams, " +
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(prob ORDER BY pos)), " +
      "(a,b) -> a+b) AS psum FROM p GROUP BY doc_id) " +
      "SELECT d.doc_id AS doc_id, coalesce(sc.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams, " +
      "coalesce(" + Queries.dround6("psum/n_bigrams") + ", 0.0) AS lm_score " +
      "FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id ORDER BY doc_id"),
    "Corpus-statistics bigram LM quality score: P(w2|w1) trained on the " +
      "corpus in one pass, docs scored by mean bigram probability " +
      "(the perplexity-filter shape, kept in exact-replayable arithmetic)")

  // q60: incremental index maintenance. Index built on vec_id % 7 != 0,
  // the rest APPENDED with the stored codebook, pairs served from the
  // combined assignment. Lossless blocking holds for any codebook, so the
  // result equals q23's brute-force pair set over the full corpus even
  // though the codebook never saw the appended vectors.
  private val q60 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q60-index"
      val emb = table(s, dir, "embeddings")
      Similarity.writeIndex(emb.filter(col("vec_id") % 7 =!= 0), scratch, nCells = 16)
      Similarity.appendToIndex(emb.filter(col("vec_id") % 7 === 0), scratch)
      Similarity.cosinePairsBlockedFromIndex(s, scratch, threshold = 0.4)
    },
    q23.oracle,
    "Incremental ANN-index append: new vectors assigned with the stored " +
      "codebook and appended partition-wise; served pairs equal the " +
      "from-scratch q23 answer (admissibility holds for any codebook)")

  // q197: EXACTLY-ONCE STREAMING ANN-index maintenance (the TWENTIETH
  // streaming query — q60's streaming twin, closing the last index family
  // without a streaming maintainer): base index on vec_id%7 != 0, the rest
  // STREAMS in — each micro-batch assigned with the STORED codebook and
  // landed idempotently in `batch=<id>/cell=<c>` partitions (the q194
  // landBatch rename protocol, so replays overwrite their own landing),
  // pairs served from base ∪ landings with radii recomputed over the
  // union. Lossless blocking holds for any codebook, so the served set
  // equals q23's from-scratch answer over the full corpus — shares its
  // oracle (batch-equivalence, the q19/q124/q194 pattern).
  private val q197 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q197-index"
      val root = new org.apache.hadoop.fs.Path(scratch)
      root.getFileSystem(s.sparkContext.hadoopConfiguration).delete(root, true)
      val emb = table(s, dir, "embeddings")
      Similarity.writeIndex(emb.filter(col("vec_id") % 7 =!= 0),
        s"$scratch/base", nCells = 16)
      val stream = Queries.stagedTableStream(s, dir, "q197", "embeddings")
        .filter(col("vec_id") % 7 === 0)
      val q = graft.streaming.StreamSink.toIvfLandings(stream,
        s"$scratch/base", s"$scratch/landings", s"$scratch/ckpt")
      q.processAllAvailable(); q.stop()
      // landing OPTIMIZE on the serve path (VERDICT r14 #3): fold the
      // per-batch landings into one compact=<g> generation before
      // serving — the oracle compare below IS the served-result
      // fold-invariance proof (same pair set as from-scratch q23)
      graft.streaming.StreamSink.compactIvfLandings(s, s"$scratch/landings")
      Similarity.cosinePairsBlockedFromIndexWithLandings(s,
        s"$scratch/base", s"$scratch/landings", threshold = 0.4)
    },
    q23.oracle,
    "Exactly-once streaming ANN-index maintenance: per-batch stored-" +
      "codebook assignment landed idempotently, folded by the landing " +
      "OPTIMIZE, pairs served from base + landings equal the " +
      "from-scratch q23 answer")

  /** q198 oracle: unrolled Lloyd's rounds in exact fixed-point integer
    * arithmetic. Same conventions as the engine: 1e-6 quantization with
    * an explicit DOUBLE cast (a raw float*1e6 runs in float32 and drifts
    * — prototyped), truncating `//` division (matches Spark `div` on
    * negatives), lowest-cluster tie-break via the rk window, empty
    * clusters carried by the LEFT JOIN + COALESCE. MATERIALIZED is
    * load-bearing (the q195 chain-inlining lesson). */
  private def lloydDistExpr(x: String, c: String, dim: Int) =
    s"list_sum([($x.v[CAST(i AS INT)] - $c.c[CAST(i AS INT)]) * " +
      s"($x.v[CAST(i AS INT)] - $c.c[CAST(i AS INT)]) " +
      s"for i in range(1, ${dim + 1})])"

  /** The unrolled Lloyd chain as CTE fragments (xs, c0, then
    * a_r/n_r/m_r/c_r per round) plus the final centroid CTE's name —
    * shared by the q198 k-means oracle and the q54 trained-codebook
    * recall oracle, so both replay Clustering.lloydCentroidInts. */
  private def lloydChain(k: Int, rounds: Int, dim: Int): (Seq[String], String) = {
    val s = Clustering.SCALE
    def distExpr(x: String, c: String) = lloydDistExpr(x, c, dim)
    val p = Seq.newBuilder[String]
    p += s"xs AS MATERIALIZED (SELECT vec_id, [CAST(floor(CAST(e AS DOUBLE) " +
      s"* $s + 0.5) AS BIGINT) for e in embedding] AS v FROM embeddings)"
    p += "c0 AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY vec_id)" +
      " - 1 AS BIGINT) AS cl, v AS c FROM (SELECT vec_id, v FROM xs " +
      s"ORDER BY vec_id LIMIT $k))"
    var prev = "c0"
    (1 to rounds).foreach { r =>
      p += s"a$r AS MATERIALIZED (SELECT vec_id, v, cl, dist FROM (" +
        s"SELECT x.vec_id, x.v, c.cl, ${distExpr("x", "c")} AS dist, " +
        s"row_number() OVER (PARTITION BY x.vec_id ORDER BY " +
        s"${distExpr("x", "c")}, c.cl) AS rk " +
        s"FROM xs x CROSS JOIN $prev c) WHERE rk = 1)"
      p += s"n$r AS MATERIALIZED (SELECT cl, CAST(i AS BIGINT) AS d, " +
        s"CAST(sum(v[CAST(i AS INT)]) AS BIGINT) // count(*) AS cd " +
        s"FROM a$r, unnest(range(1, ${dim + 1})) t(i) GROUP BY cl, i)"
      p += s"m$r AS MATERIALIZED (SELECT cl, list(cd ORDER BY d) AS c " +
        s"FROM n$r GROUP BY cl)"
      p += s"c$r AS MATERIALIZED (SELECT p.cl, COALESCE(m.c, p.c) AS c " +
        s"FROM $prev p LEFT JOIN m$r m ON p.cl = m.cl)"
      prev = s"c$r"
    }
    (p.result(), prev)
  }

  private def kmeansOracle(k: Int, rounds: Int, dim: Int): String = {
    def distExpr(x: String, c: String) = lloydDistExpr(x, c, dim)
    val (chain, prev) = lloydChain(k, rounds, dim)
    val p = Seq.newBuilder[String]
    p ++= chain
    p += s"af AS MATERIALIZED (SELECT vec_id, cl, dist FROM (" +
      s"SELECT x.vec_id, c.cl, ${distExpr("x", "c")} AS dist, " +
      s"row_number() OVER (PARTITION BY x.vec_id ORDER BY " +
      s"${distExpr("x", "c")}, c.cl) AS rk " +
      s"FROM xs x CROSS JOIN $prev c) WHERE rk = 1)"
    p += s"cch AS MATERIALIZED (SELECT cl, list_sum([c[CAST(i AS INT)] * i " +
      s"for i in range(1, ${dim + 1})]) AS ccheck FROM $prev)"
    "WITH " + p.result().mkString(", ") +
      " SELECT a.cl AS cluster, count(*) AS n, " +
      "CAST(sum(a.dist) AS BIGINT) AS wss, " +
      "CAST(any_value(h.ccheck) AS BIGINT) AS ccheck " +
      "FROM af a JOIN cch h ON a.cl = h.cl GROUP BY a.cl ORDER BY cluster"
  }

  // q198: exact fixed-point Lloyd's k-means over the embedding corpus —
  // the clustering family's direct readout (since r16 the same training
  // loop also powers q54's trained ANN-recall codebook). 3 rounds, k=8, first-k
  // seeds; per round one narrow argmin over broadcast centroid literals
  // + one keyed agg to k·dim driver rows (the q195 fixed-point shape at
  // embedding scale); the oracle unrolls every round.
  private val q198 = Q(
    (s, dir) => graft.ops.Clustering.kmeansFixedPoint(
      table(s, dir, "embeddings"), k = 8, rounds = 3),
    Some(kmeansOracle(k = 8, rounds = 3, dim = 64)),
    "Exact fixed-point Lloyd's k-means (3 unrolled rounds, integer " +
      "arithmetic, deterministic ties): cluster sizes, within-cluster " +
      "squared error, centroid checksums — all SQL-replayed exactly")

  // q199: exact substring dedup (the Lee et al. class — VERDICT r14 #2):
  // pairs sharing a verbatim span of >= 8 tokens with the longest-span
  // length, via winnowed k-gram candidates + string-equal L-gram
  // diagonal-run verify (Dedup.exactSubstringPairs). The oracle is the
  // brute-force relational twin: ALL L-grams equi-joined (a shared
  // >=L-token span exists iff a shared L-gram exists), max consecutive
  // diagonal run + L - 1 = the exact longest shared span.
  private val q199 = Q(
    (s, dir) => Dedup.exactSubstringPairs(table(s, dir, "documents"),
      "doc_id", "text", minSpanTokens = 8),
    Some {
      val L = 8
      s"WITH w AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') " +
        "AS ws FROM documents), " +
        "g AS MATERIALIZED (SELECT doc_id, i, " +
        s"array_to_string(ws[i:i+${L - 1}], chr(31)) AS gram " +
        s"FROM w, unnest(range(1, len(ws) - $L + 2)) t(i) " +
        s"WHERE len(ws) >= $L), " +
        "m AS MATERIALIZED (SELECT a.doc_id AS ida, b.doc_id AS idb, " +
        "a.i AS i, b.i AS j FROM g a JOIN g b ON a.gram = b.gram " +
        "AND a.doc_id < b.doc_id), " +
        "runs AS (SELECT ida, idb, i - j AS diag, " +
        "i - row_number() OVER (PARTITION BY ida, idb, i - j ORDER BY i) " +
        "AS grp FROM m) " +
        s"SELECT ida, idb, CAST(max(cnt) + $L - 1 AS BIGINT) AS span " +
        "FROM (SELECT ida, idb, diag, grp, count(*) AS cnt FROM runs " +
        "GROUP BY ida, idb, diag, grp) " +
        "GROUP BY ida, idb ORDER BY ida, idb"
    },
    "Exact substring dedup: document pairs sharing a verbatim span of " +
      ">= 8 tokens with the exact longest-span length — winnowing " +
      "candidates (content-defined, the MOSS guarantee), L-gram " +
      "diagonal-run verify on collisions only")

  // q217: LINE-level corpus dedup WITH document reconstitution (the
  // CCNet/C4/Dolma cleaning pass — VERDICT r17 #4): segment each document
  // into non-overlapping 3-word lines (tail-preserving), count distinct
  // documents per line corpus-wide, drop every line shared by >= 2
  // documents from ALL documents, and re-emit the cleaned documents with
  // intra-document line order preserved. Where q70 INVENTORIES repeated
  // passages, q217 REMOVES them — the missing family member that actually
  // produces cleaned training text.
  private val q217 = Q(
    (s, dir) => Dedup.lineDedupReconstitute(table(s, dir, "documents"),
        "doc_id", "text", width = 3, minDocs = 2)
      .orderBy("doc_id"),
    Some("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
      "lp AS (SELECT doc_id, unnest(range((len(ws)+2)//3)) AS pos, ws FROM w), " +
      "l AS (SELECT doc_id, pos, array_to_string(ws[pos*3+1:pos*3+3], ' ') AS line FROM lp), " +
      "b AS (SELECT line FROM l GROUP BY line HAVING count(DISTINCT doc_id) >= 2), " +
      "k AS (SELECT doc_id, pos, l.line, (b.line IS NOT NULL) AS dropped " +
      "FROM l LEFT JOIN b ON l.line = b.line) " +
      "SELECT doc_id, coalesce(string_agg(CASE WHEN NOT dropped THEN line END, ' ' " +
      "ORDER BY pos), '') AS clean_text, " +
      "count(CASE WHEN NOT dropped THEN 1 END) AS n_kept, " +
      "count(CASE WHEN dropped THEN 1 END) AS n_dropped " +
      "FROM k GROUP BY doc_id ORDER BY doc_id"),
    "Line-level corpus dedup with document reconstitution (CCNet/C4 " +
      "class): corpus-wide line counts, boilerplate lines dropped from " +
      "all documents, cleaned documents re-emitted in original order")

  private val allTables = Seq("customer", "documents", "embeddings", "events",
    "lineitem", "nation", "orders", "part", "region", "supplier")

  private val q30 = Q(
    (s, dir) => {
      // a catalog sweep is N independent jobs — submit them concurrently
      // from the driver (Spark's scheduler interleaves their stages) rather
      // than serializing 10 agg subtrees behind one union. Each count is
      // still a distributed job; only 10 scalars come back to the driver.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val counts = Await.result(
        Future.sequence(allTables.map(t => Future(t -> table(s, dir, t).count()))),
        Duration.Inf)
      import s.implicits._
      counts.toDF("tbl", "n").orderBy("tbl")
    },
    Some(allTables.map(t => s"SELECT '$t' AS tbl, count(*) AS n FROM $t")
      .mkString("", " UNION ALL ", " ORDER BY tbl")),
    "Catalog sweep: per-table row counts, jobs submitted concurrently")

  private val q31 = Q(
    (s, dir) => {
      import graft.ops.BarOps
      val ev = BarOps.withEastern(table(s, dir, "events"), "ts")
      ev.withColumn("session",
          coalesce(BarOps.sessionColumn(col("hhmm")), lit("closed")))
        .groupBy(col("session")).agg(count(lit(1)).as("n"))
        .orderBy("session")
    },
    // Test events all fall in Jan 2024 (EST, UTC-5, no DST transition in
    // window) so the oracle can use a fixed offset; the engine itself uses
    // the DST-aware from_utc_timestamp (unit-tested on transition days).
    Some("WITH h AS (SELECT hour(ts - INTERVAL 5 HOUR)*100 + minute(ts - INTERVAL 5 HOUR) AS hhmm FROM events) " +
      "SELECT CASE WHEN hhmm BETWEEN 400 AND 929 THEN 'premarket' " +
      "WHEN hhmm BETWEEN 930 AND 1600 THEN 'regular' " +
      "WHEN hhmm BETWEEN 1601 AND 2000 THEN 'afterhours' ELSE 'closed' END AS session, " +
      "count(*) AS n FROM h GROUP BY 1 ORDER BY session"),
    "Reference ET session classification (premarket/regular/afterhours) " +
      "as a single-pass session column")

  // q175: per-SESSION VWAP — the reference's two core domain concepts
  // composed (the 3 session tables of ingest_1m_session.py:204-209 and
  // the vwap field of schemas.py:35): session classification (q31's
  // DST-aware column) x the exact-rational volume-weighted average
  // (q161's arithmetic, weight = props.k). One pass, one keyed agg.
  private val q175 = Q(
    (s, dir) => {
      import graft.ops.BarOps
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      BarOps.withEastern(table(s, dir, "events"), "ts")
        .withColumn("session",
          coalesce(BarOps.sessionColumn(col("hhmm")), lit("closed")))
        .select(col("session"),
          graft.ops.TimeSeries.toUnits(col("value")).as("u"),
          from_json(col("props"), lit("k INT")).getField("k")
            .cast("long").as("k"))
        .filter(col("u").isNotNull && col("k").isNotNull && col("k") > 0)
        .groupBy(col("session"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("u") * col("k"))).as("vwap_num"),
          sum(col("k")).as("vwap_den"))
        .select(col("session"), col("n"),
          col("vwap_num").cast("string").as("vwap_num"), col("vwap_den"),
          round(col("vwap_num").cast("double") /
            col("vwap_den").cast("double"), 6).as("vwap6"))
        .orderBy("session")
    },
    Some("WITH h AS (SELECT " +
      "hour(ts - INTERVAL 5 HOUR)*100 + minute(ts - INTERVAL 5 HOUR) AS hhmm, " +
      "CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS u, " +
      "CAST(props->>'k' AS BIGINT) AS k FROM events " +
      "WHERE value IS NOT NULL AND CAST(props->>'k' AS BIGINT) > 0), " +
      "c AS (SELECT CASE WHEN hhmm BETWEEN 400 AND 929 THEN 'premarket' " +
      "WHEN hhmm BETWEEN 930 AND 1600 THEN 'regular' " +
      "WHEN hhmm BETWEEN 1601 AND 2000 THEN 'afterhours' ELSE 'closed' END " +
      "AS session, u, k FROM h), " +
      "a AS (SELECT session, count(*) AS n, " +
      "CAST(sum(u * k) AS DECIMAL(38,0)) AS vwap_num, " +
      "CAST(sum(k) AS BIGINT) AS vwap_den FROM c GROUP BY session) " +
      "SELECT session, n, CAST(vwap_num AS VARCHAR) AS vwap_num, " +
      "vwap_den, " +
      dround6("CAST(vwap_num AS DOUBLE) / vwap_den") + " AS vwap6 " +
      "FROM a ORDER BY session"),
    "Per-session VWAP: the reference's session classification composed " +
      "with its vwap metric — exact rational per trading session, one " +
      "pass, one keyed agg")

  // q176: CONTENT-DEFINED chunk dedup — the shift-robust twin of q70's
  // fixed tiling. Boundary rule = polyHash(word) mod 8 == 0 (the q27
  // char fold, so the oracle replays the chunking verbatim: per-word
  // hash → boundary flag → chunk id as a prefix sum → string_agg). An
  // early insertion re-synchronizes at the next boundary where fixed
  // tiles shift forever (the rsync/FastCDC argument, spec-shown).
  private val duckWordHash =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(string_split(word, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      "(a, b) -> (a * 31 + b) % 1000000007)"

  private val q176 = Q(
    (s, dir) => Dedup.cdcChunkDups(table(s, dir, "documents"),
        "doc_id", "text", divisor = 8, minWords = 2)
      .orderBy("chunk"),
    Some("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
      "p AS (SELECT doc_id, unnest(ws) AS word, unnest(range(len(ws))) AS pos FROM w), " +
      s"b AS (SELECT doc_id, pos, word, CASE WHEN $duckWordHash % 8 = 0 " +
      "THEN 1 ELSE 0 END AS bnd FROM p), " +
      "c AS (SELECT doc_id, pos, word, coalesce(sum(bnd) OVER " +
      "(PARTITION BY doc_id ORDER BY pos " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid FROM b), " +
      "g AS (SELECT doc_id, cid, string_agg(word, ' ' ORDER BY pos) AS chunk, " +
      "count(*) AS nw FROM c GROUP BY doc_id, cid) " +
      "SELECT chunk, count(DISTINCT doc_id) AS n_docs, " +
      "count(*) AS n_occurrences FROM g WHERE nw >= 2 GROUP BY chunk " +
      "HAVING count(DISTINCT doc_id) > 1 ORDER BY chunk"),
    "Content-defined chunk dedup: boundaries where polyHash(word) mod 8 " +
      "= 0 — edits re-synchronize at the next boundary, so shifted " +
      "copies still share chunks fixed tiling loses")

  // q183: BM25 SERVED from the durable inverted index — the production
  // search shape (tokenize at ingest, serve queries from postings). The
  // postings scan is partition-pruned to the query terms' hash buckets,
  // (N, Σdl) ride as sidecar literals, no text is read at serve time.
  // Index built on first touch keyed by sf dir + source fingerprint
  // (the q84 pattern); identical arithmetic to q95 ⇒ shares its oracle.
  // lazy: shares q95's oracle, which is declared later in this file
  private lazy val q183 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q183-index-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val fp = graft.io.Lake.sourceFingerprint(s, s"$dir/documents.parquet")
      if (!graft.io.Lake.exists(s, s"$scratch/postings") ||
          !graft.io.Lake.fingerprintCurrent(s, s"$scratch/_source_fp", fp)) {
        TextAnalysis.writeBm25Index(table(s, dir, "documents"), scratch)
        graft.io.Lake.writeFingerprint(s, s"$scratch/_source_fp", fp)
      }
      TextAnalysis.bm25TopKFromIndex(s, scratch,
        Seq("join", "scan", "spark"), k = 25)
    },
    q95.oracle,
    "BM25 served from the durable inverted index: partition-pruned " +
      "postings, sidecar corpus stats, zero tokenization at query time " +
      "— hash-equal to the in-session q95")

  private val q32 = Q(
    (s, dir) => {
      import s.implicits._
      val stream = Queries.stagedEventStream(s, dir, "q32")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .as[graft.streaming.Sessionize.Ev]
      val sessions = graft.streaming.Sessionize.streaming(stream, gapMinutes = 30)
      graft.streaming.Sessionize.latestSnapshot(
        Queries.runToMemorySink(sessions.toDF(), "q32", "update"))
    },
    Some("WITH ev AS (SELECT make_timestamp(epoch_ns(ts)//1000) AS ts, user_id, event_id FROM events), " +
      "g AS (SELECT user_id, ts, event_id, CASE WHEN lag(ts) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id) IS NULL OR epoch_us(ts) - " +
      "epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 " +
      "THEN 1 ELSE 0 END AS new_sess FROM ev), " +
      "s2 AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS UNBOUNDED PRECEDING) AS sid FROM g) " +
      "SELECT user_id, min(ts) AS session_start, max(ts) AS session_end, count(*) AS n " +
      "FROM s2 GROUP BY user_id, sid ORDER BY user_id, session_start"),
    "Stateful streaming sessionization (flatMapGroupsWithState, 30-minute " +
      "gap); oracle is the declarative batch window formulation")

  /** BM25 ranked retrieval over the corpus for a 3-term keyword query —
    * the lexical-retrieval twin of the ANN pack and the standard
    * hard-negative miner for retrieval training data. Ratio idf (no
    * ln, same bit-portability rule as q80), per-doc contributions
    * summed in term order, score rounded to 6 dp; tf and doc length
    * fold in-row (WordCounts), only query-term rows ever shuffle. */
  private val q95 = Q(
    (s, dir) => TextAnalysis.bm25TopK(table(s, dir, "documents"),
      Seq("join", "scan", "spark"), k = 25),
    Some("WITH tok AS (SELECT doc_id, w AS term FROM " +
      "(SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents " +
      "WHERE text IS NOT NULL) WHERE w <> ''), " +
      "dl AS (SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl " +
      "FROM documents WHERE text IS NOT NULL), " +
      "st AS (SELECT count(*) AS n, sum(dl) AS sdl FROM dl), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok " +
      "WHERE term IN ('join', 'scan', 'spark') GROUP BY doc_id, term), " +
      "dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
      "c AS (SELECT tf.doc_id, tf.term, " +
      "((st.n - dfq.df + 0.5) / (dfq.df + 0.5)) * (tf.tf * 2.2) / " +
      "(tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / (CAST(st.sdl AS DOUBLE) / st.n)))) AS c " +
      "FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st), " +
      "sc AS (SELECT doc_id, count(*) AS n_terms, " +
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY term)), " +
      "(a, b) -> a + b) AS s FROM c GROUP BY doc_id) " +
      "SELECT doc_id, n_terms, " +
      "CAST(round(CAST(CAST(s AS VARCHAR) AS DECIMAL(28,18)), 6) AS DOUBLE) AS bm25 " +
      "FROM sc ORDER BY bm25 DESC, doc_id LIMIT 25"),
    "BM25 top-25 docs for a keyword query: ratio idf, term-ordered " +
      "contribution fold, in-row tf/doc-length — only query-term rows " +
      "shuffle")

  /** Pseudo-relevance-feedback retrieval (q159): q95's BM25 run twice
    * with a Rocchio-style expansion mined from the seed docs between
    * the passes — recall lever for under-specified queries. The oracle
    * replays both passes with q95's proven arithmetic; the tf CTE is
    * parameterized by the term source (literal list vs the expansion
    * subquery). */
  private val q159 = {
    val q0 = Seq("join", "scan", "spark")
    val q0Sql = q0.map(t => s"'$t'").mkString(", ")
    // one BM25 pass: tf/df/contribution/score given a term predicate;
    // identical arithmetic to q95's proven replay
    def pass(tag: String, termPred: String, scoreCols: String) =
      s"tf$tag AS (SELECT doc_id, term, count(*) AS tf FROM tok " +
        s"WHERE $termPred GROUP BY doc_id, term), " +
        s"df$tag AS (SELECT term, count(*) AS df FROM tf$tag GROUP BY term), " +
        s"c$tag AS (SELECT tf$tag.doc_id, tf$tag.term, " +
        s"((st.n - df$tag.df + 0.5) / (df$tag.df + 0.5)) * (tf$tag.tf * 2.2) / " +
        s"(tf$tag.tf + 1.2 * (0.25 + 0.75 * (dl.dl / (CAST(st.sdl AS DOUBLE) / st.n)))) AS c " +
        s"FROM tf$tag JOIN df$tag USING (term) JOIN dl USING (doc_id) CROSS JOIN st), " +
        s"s$tag AS (SELECT doc_id, $scoreCols" +
        "CAST(round(CAST(CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list(c ORDER BY term)), (a, b) -> a + b) AS VARCHAR) " +
        "AS DECIMAL(28,18)), 6) AS DOUBLE) AS bm25 " +
        s"FROM c$tag GROUP BY doc_id)"
    Q(
      (s, dir) => TextAnalysis.bm25Prf(table(s, dir, "documents"),
        q0, kSeed = 10, mExpand = 3, k = 25),
      Some("WITH tok AS (SELECT doc_id, w AS term FROM " +
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents " +
        "WHERE text IS NOT NULL) WHERE w <> ''), " +
        "dl AS (SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl " +
        "FROM documents WHERE text IS NOT NULL), " +
        "st AS (SELECT count(*) AS n, sum(dl) AS sdl FROM dl), " +
        pass("1", s"term IN ($q0Sql)", "") + ", " +
        "seed AS (SELECT doc_id FROM s1 ORDER BY bm25 DESC, doc_id LIMIT 10), " +
        "exp AS (SELECT term FROM (SELECT t.term, count(*) AS w FROM tok t " +
        s"JOIN seed USING (doc_id) WHERE t.term NOT IN ($q0Sql) " +
        "GROUP BY t.term) ORDER BY w DESC, term LIMIT 3), " +
        s"q AS (SELECT unnest([$q0Sql]) AS term UNION ALL SELECT term FROM exp), " +
        pass("2", "term IN (SELECT term FROM q)", "count(*) AS n_terms, ") +
        " SELECT doc_id, n_terms, bm25 FROM s2 " +
        "ORDER BY bm25 DESC, doc_id LIMIT 25"),
      "PRF query expansion: BM25 seed pass, top expansion terms mined " +
        "from the seed docs (bounded driver metadata), expanded BM25 " +
        "final pass — two inverted-index retrieval jobs")
  }

  // q171: dedup-pair EXPLANATION — the audit evidence behind each
  // near-dup verdict: shared-shingle count + per-side coverage ppm
  // (asymmetric: a quote covers the short doc, not the long one).
  // Oracle = q20's exact pair set with the same integer arithmetic.
  private val q171 = Q(
    (s, dir) => Dedup.explainPairs(table(s, dir, "documents"), "doc_id",
        "text", shingleWidth = 3, k = 128, bands = 32, threshold = 0.8)
      .orderBy("da", "db"),
    Some(duckWordShingles +
      ", z AS (SELECT doc_id, count(*) AS nsh FROM s GROUP BY doc_id), " +
      "c AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter " +
      "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "p AS (SELECT da, db, inter, x.nsh AS nsh_a, y.nsh AS nsh_b " +
      "FROM c JOIN z x ON c.da = x.doc_id JOIN z y ON c.db = y.doc_id " +
      "WHERE CAST(inter AS DOUBLE) / (x.nsh + y.nsh - inter) >= 0.8) " +
      "SELECT da, db, inter, nsh_a, nsh_b, " +
      "inter * 1000000 // nsh_a AS cov_a_ppm, " +
      "inter * 1000000 // nsh_b AS cov_b_ppm " +
      "FROM p ORDER BY da, db"),
    "Near-dup pair explanation: shared-shingle evidence + per-side " +
      "coverage ppm behind each dedup verdict — same banding/verify " +
      "path, one extra in-row projection")

  /** Embedding-quality audit (q169) — the bad-vector screen run before
    * ANY ANN/semantic pass (q23/q29/q85/q149 all divide by the norm: a
    * zero or non-finite vector poisons them silently): per label, the
    * dimension profile (distinct/min/max — a ragged dim is an upstream
    * encoder bug), zero-norm and non-finite counts, and min/max norm
    * (6 dp; min/max are order-independent where a mean of floats is
    * not). In-row fold for the squared norm (left-to-right, the q23
    * replay convention), one keyed agg. */
  private val q169 = Q(
    (s, dir) => {
      val e = table(s, dir, "embeddings")
        .select(col("label"),
          size(col("embedding")).cast("long").as("d"),
          expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
            "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("n2"),
          expr("exists(embedding, x -> isnan(x) OR abs(x) = CAST('Infinity' AS FLOAT))")
            .as("bad"))
      e.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          countDistinct(col("d")).as("n_dims"),
          min(col("d")).as("min_dim"), max(col("d")).as("max_dim"),
          sum(when(col("n2") === 0.0, 1L).otherwise(0L)).as("n_zero"),
          sum(when(col("bad"), 1L).otherwise(0L)).as("n_nonfinite"),
          round(min(sqrt(col("n2"))), 6).as("min_nrm6"),
          round(max(sqrt(col("n2"))), 6).as("max_nrm6"))
        .orderBy("label")
    },
    Some("WITH e AS (SELECT label, CAST(len(embedding) AS BIGINT) AS d, " +
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      "list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), " +
      "(a, b) -> a + b) AS n2, " +
      "len(list_filter(embedding, x -> isnan(x) OR isinf(x))) > 0 AS bad " +
      "FROM embeddings) " +
      "SELECT label, count(*) AS n_vecs, " +
      "CAST(count(DISTINCT d) AS BIGINT) AS n_dims, " +
      "min(d) AS min_dim, max(d) AS max_dim, " +
      "CAST(sum(CASE WHEN n2 = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero, " +
      "CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite, " +
      dround6("min(sqrt(n2))") + " AS min_nrm6, " +
      dround6("max(sqrt(n2))") + " AS max_nrm6 " +
      "FROM e GROUP BY label ORDER BY label"),
    "Embedding-quality audit per label: dim profile, zero-norm and " +
      "non-finite counts, min/max norm — the bad-vector screen before " +
      "every ANN/semantic pass")

  /** Term co-occurrence association mining over the corpus
    * (ops/TextAnalysis.termLift): doc counts + integer fixed-point LIFT
    * for every frequent term pair — collocation discovery / template
    * detection; the oracle replays the distinct-token self-join and
    * the exact truncating lift arithmetic. */
  private val q120 = Q(
    (s, dir) => TextAnalysis.termLift(table(s, dir, "documents"), minDf = 10)
      .orderBy("ta", "tb"),
    Some("WITH tok AS (SELECT DISTINCT doc_id, w AS term FROM " +
      "(SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents " +
      "WHERE text IS NOT NULL) WHERE w <> ''), " +
      "n AS (SELECT count(*) AS nd FROM documents WHERE text IS NOT NULL), " +
      "dft AS (SELECT term, count(*) AS ndf FROM tok GROUP BY term), " +
      "pairs AS (SELECT a.term AS ta, b.term AS tb, count(*) AS n_ab " +
      "FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.term < b.term " +
      "GROUP BY 1, 2) " +
      "SELECT ta, tb, n_ab, " +
      "CAST((((n_ab * 1000000) // na.ndf) * nd) // nb.ndf AS BIGINT) AS lift6 " +
      "FROM pairs JOIN dft na ON pairs.ta = na.term " +
      "JOIN dft nb ON pairs.tb = nb.term CROSS JOIN n " +
      "WHERE na.ndf >= 10 AND nb.ndf >= 10 ORDER BY ta, tb"),
    "Term co-occurrence lift: in-row sorted pair generation from one " +
      "WordCounts pass, map-side-combined pair counts, broadcast df/N, " +
      "integer fixed-point lift")

  /** Blocked fuzzy entity linkage over part names: distinct values
    * first (record counts ride along), candidates from an equi-join on
    * the head noun (the block key), levenshtein <= 2 on candidates
    * only — never all pairs. The entity-resolution step exact dedup
    * cannot see; the oracle replays the identical blocked join. */
  private val q97 = Q(
    (s, dir) => Dedup.fuzzyLinkPairs(
        table(s, dir, "part").select(col("p_name")),
        "p_name", element_at(split(col("p_name"), " "), 2), maxDist = 2)
      .orderBy("val_a", "val_b"),
    Some("WITH v AS (SELECT p_name, count(*) AS n, " +
      "string_split(p_name, ' ')[2] AS blk FROM part " +
      "WHERE p_name IS NOT NULL GROUP BY p_name) " +
      "SELECT a.p_name AS val_a, b.p_name AS val_b, " +
      "CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist, " +
      "a.n AS n_a, b.n AS n_b " +
      "FROM v a JOIN v b ON a.blk = b.blk AND a.p_name < b.p_name " +
      "WHERE levenshtein(a.p_name, b.p_name) <= 2 " +
      "ORDER BY val_a, val_b"),
    "Blocked fuzzy entity linkage: distinct part names, head-noun " +
      "blocking, edit distance <= 2 on in-block candidates only")

  // q145: q97's linkage re-scored with Jaro-Winkler — the record-linkage
  // default for short name-like strings (transposition-tolerant,
  // prefix-weighted). The scorer is the compiled JaroWinklerSim
  // expression; its semantics were probed against DuckDB's
  // jaro_winkler_similarity (window, half-transpositions, 0.7 boost
  // threshold, 4-char prefix cap, empty-string → 0), and round-6 is
  // engine-identical by the rational-denominator argument, so the
  // whole scored operator is hash-checked.
  private val q145 = Q(
    (s, dir) => Dedup.fuzzyLinkPairsScored(
        table(s, dir, "part").select(col("p_name")),
        "p_name", element_at(split(col("p_name"), " "), 2), minSim = 0.9)
      .orderBy("val_a", "val_b"),
    Some("WITH v AS (SELECT p_name, count(*) AS n, " +
      "string_split(p_name, ' ')[2] AS blk FROM part " +
      "WHERE p_name IS NOT NULL GROUP BY p_name) " +
      "SELECT a.p_name AS val_a, b.p_name AS val_b, " +
      dround6("jaro_winkler_similarity(a.p_name, b.p_name)") + " AS sim, " +
      "a.n AS n_a, b.n AS n_b " +
      "FROM v a JOIN v b ON a.blk = b.blk AND a.p_name < b.p_name " +
      "WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.9 " +
      "ORDER BY val_a, val_b"),
    "Jaro-Winkler fuzzy linkage: blocked distinct-value pairs scored " +
      "by the compiled similarity kernel (>= 0.9), bit-matched to the " +
      "oracle's native jaro_winkler_similarity")

  // q148: golden-record survivorship — the MERGE step of record linkage
  // over q20's near-dup clusters: one merged record per cluster, each
  // FIELD resolved by its own rule (completeness / modal / provenance
  // priority — the MDM "best version of the truth" shape). Source
  // priority = the numeric suffix of the source tag (src0 most trusted),
  // an exactly-replayable rank. Oracle: recursive-CTE components + one
  // row_number argmax replay per rule.
  private val q148 = Q(
    (s, dir) => Dedup.goldenRecords(table(s, dir, "documents"), "doc_id",
        Dedup.minhashNearDups(table(s, dir, "documents"), "doc_id", "text",
          shingleWidth = 3, k = 128, bands = 32, threshold = 0.8),
        priorityCol = substring(col("source"), 4, 10).cast("int"))
      .orderBy("cluster"),
    Some(duckNearDupEdges +
      ", m AS (SELECT d.*, c.cluster FROM documents d " +
      "JOIN comp c ON d.doc_id = c.id), " +
      "g AS (SELECT cluster, count(*) AS n_members, " +
      "min(doc_id) AS canonical_id FROM m GROUP BY cluster), " +
      "tx AS (SELECT cluster, text AS best_text FROM " +
      "(SELECT cluster, text, row_number() OVER (PARTITION BY cluster " +
      "ORDER BY n_chars DESC, doc_id ASC) AS rn FROM m) WHERE rn = 1), " +
      "sc AS (SELECT cluster, source AS top_source FROM " +
      "(SELECT cluster, source, row_number() OVER (PARTITION BY cluster " +
      "ORDER BY CAST(substr(source, 4) AS INT) ASC, doc_id ASC) AS rn " +
      "FROM m) WHERE rn = 1), " +
      "lm AS (SELECT cluster, lang AS lang_mode FROM " +
      "(SELECT cluster, lang, row_number() OVER (PARTITION BY cluster " +
      "ORDER BY cnt DESC, lang DESC) AS rn FROM " +
      "(SELECT cluster, lang, count(*) AS cnt FROM m GROUP BY 1, 2)) " +
      "WHERE rn = 1) " +
      "SELECT g.cluster, g.n_members, g.canonical_id, tx.best_text, " +
      "lm.lang_mode, sc.top_source FROM g " +
      "JOIN tx USING (cluster) JOIN lm USING (cluster) " +
      "JOIN sc USING (cluster) ORDER BY g.cluster"),
    "Golden-record survivorship per near-dup cluster: per-field merge " +
      "rules (completeness argmax, modal value, provenance priority) " +
      "in one keyed agg + one mode agg — the MDM merge step")

  // q152: boilerplate passage mining — the most-shared word 5-grams
  // (doc-frequency semantics, one count per doc) with deterministic
  // tie-break; the template detector corpus curation runs before
  // near-dup removal. One keyed agg + TakeOrdered top-k.
  private val q152 = Q(
    (s, dir) => TextAnalysis.boilerplateNgrams(table(s, dir, "documents"),
      n = 5, minDocs = 2, k = 20),
    Some("WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws " +
      "FROM documents), " +
      s"g AS (SELECT DISTINCT doc_id, ${duckWordGrams("ws", 5)} AS gram FROM w), " +
      "c AS (SELECT gram, count(*) AS n_docs FROM g GROUP BY gram) " +
      "SELECT gram, n_docs FROM c WHERE n_docs >= 2 " +
      "ORDER BY n_docs DESC, gram LIMIT 20"),
    "Boilerplate n-gram mining: top-20 most-shared word 5-grams " +
      "(doc frequency via the compiled distinct-shingle kernel, " +
      "map-side-combined agg, TakeOrdered top-k)")

  // q150: exact-phrase probe scan — multi-pattern containment (benchmark
  // answer strings / canary GUIDs) via ONE compiled Aho–Corasick pass
  // per doc, corpus scanned once regardless of probe count. The pos
  // contract is byte-for-byte ANSI strpos over the padded strings, so
  // the oracle replays it with a 5-row VALUES cross join.
  private val q150Phrases = Seq("batch batch batch", "join order",
    "window window", "spark group query", "data line join")
  private val q150 = Q(
    (s, dir) => TextAnalysis.phraseHits(table(s, dir, "documents"),
        q150Phrases)
      .orderBy("doc_id", "pid"),
    Some("WITH p AS (SELECT CAST(c0 AS BIGINT) AS pid, c1 AS phrase FROM (VALUES " +
      q150Phrases.zipWithIndex
        .map { case (p, i) => s"(${i + 1}, '$p')" }.mkString(", ") +
      ") AS t(c0, c1)) " +
      "SELECT d.doc_id, p.pid, p.phrase, " +
      "strpos(' '||d.text||' ', ' '||p.phrase||' ') AS pos " +
      "FROM documents d CROSS JOIN p " +
      "WHERE strpos(' '||d.text||' ', ' '||p.phrase||' ') > 0 " +
      "ORDER BY doc_id, pid"),
    "Exact-phrase probe scan: first word-aligned occurrence of every " +
      "probe phrase in one compiled Aho-Corasick pass per document")

  // q149: SEMANTIC decontamination — the embedding-space member of the
  // decontamination family (exact q50, fuzzy-lexical q136): train
  // vectors within cosine 0.4 of any held-out vector (vec_id % 10 = 7,
  // the q47-style hash split), found by a BIPARTITE blocked join that
  // never generates the train×train bulk. Oracle = brute-force
  // bipartite cosine over the same split (q23's replay convention).
  private val q149 = Q(
    (s, dir) => Similarity.semanticDecontaminate(
      table(s, dir, "embeddings"), pmod(col("vec_id"), lit(10)) === 7,
      threshold = 0.4, nCells = 16),
    Some(duckEmb + " SELECT c.vec_id AS train_id, q.vec_id AS heldout_id, " +
      dround6(s"${ddot("q.v", "c.v")} / (q.nrm * c.nrm)") + " AS sim " +
      "FROM n q JOIN n c ON (q.vec_id % 10 = 7) AND (c.vec_id % 10 != 7) " +
      s"WHERE ${ddot("q.v", "c.v")} / (q.nrm * c.nrm) >= 0.4 " +
      "ORDER BY train_id, heldout_id"),
    "Semantic decontamination: train vectors leaking into the held-out " +
      "split by embedding cosine — bipartite lossless-blocked join, the " +
      "train x train bulk never generated")

  /** Near-dup-aware split decontamination (the q47+q50 generalization):
    * train/val/test assignment where a whole near-dup connected
    * component (q62's clusters over q20's pair set) lands in ONE
    * split — the leakage guard production training pipelines need
    * (a near-duplicate of a test doc must not train). Split key =
    * cluster min-id for paired docs, own id for singletons; bucket =
    * the q47 multiplicative hash, so singleton assignments equal the
    * plain q47 split. Fully SQL-replayed: recursive-CTE components +
    * the q47 hash arithmetic. */
  private val q106 = Q(
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleWidth = 3, k = 128, bands = 32, threshold = 0.8)
      graft.ops.Curation.clusterAwareSplit(docs, "doc_id", pairs,
          trainPct = 80, valPct = 10)
        .select(col("doc_id"), col("cluster_key"), col("split"))
        .orderBy("doc_id")
    },
    Some {
      val h = "(((coalesce(c.cluster, d.doc_id) % 2147483648) * 2654435761 " +
        "+ 2654435769) % 4294967296)"
      duckNearDupEdges +
        " SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster_key, " +
        s"CASE WHEN $h % 100 < 80 THEN 'train' " +
        s"WHEN $h % 100 < 90 THEN 'val' ELSE 'test' END AS split " +
        "FROM documents d LEFT JOIN comp c ON d.doc_id = c.id " +
        "ORDER BY d.doc_id"
    },
    "Cluster-aware 80/10/10 split: near-dup components routed wholly " +
      "into one split (no train/test leakage through near-duplicates), " +
      "singletons identical to the plain q47 split")

  /** Hybrid retrieval fusion (the RAG-stack shape): per query doc,
    * reciprocal-rank fusion of the ANN cosine top-10 (served from the
    * durable IVF index, q56's path at k=10) and the BM25 more-like-this
    * top-10 over word-3-gram shingle terms — rank-only combination in
    * fixed-point integer units (1e12 div (60+rank)), bit-reproducible
    * and fully SQL-replayed (IVF CTE chain + inverted-index BM25 CTEs +
    * the integer RRF fold). Queries = the q55/q56 set (id % 10 = 0);
    * doc_id and vec_id share the id space (TESTDATA: one embedding per
    * document). */
  private val q107 = Q(
    (s, dir) => {
      // first-touch index build keyed by sf dir (the q84/q85 steady-state
      // pattern): production admits vectors through appendToIndex at
      // ingest; the hybrid-search serve reads only the index tables
      val scratch = s"${Queries.scratchRoot}/q107-index-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      // register up front: on the serve-only (index-exists) path no
      // table() call precedes the graft_dot use inside the IVF serve
      graft.functions.CatalystExpressions.register(s)
      // source fingerprint (r12 watch item, q119 pattern)
      val fp = graft.io.Lake.sourceFingerprint(s, s"$dir/embeddings.parquet")
      if (!graft.io.Lake.exists(s, s"$scratch/assignment") ||
          !graft.io.Lake.fingerprintCurrent(s, s"$scratch/_source_fp", fp)) {
        Similarity.writeIndex(table(s, dir, "embeddings"), scratch, nCells = 16)
        graft.io.Lake.writeFingerprint(s, s"$scratch/_source_fp", fp)
      }
      // r13: the LEXICAL side serves from a durable shingle posting
      // index too (VERDICT r12 item 5) — same first-touch protocol,
      // term-bucketed table so the serve's posting join is exchange-free
      val mlt = s"$scratch-mlt"
      val mltTbl = "graft_mlt_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val dfp = graft.io.Lake.sourceFingerprint(s, s"$dir/documents.parquet")
      if (!graft.io.Lake.exists(s, s"$mlt/postings") ||
          !graft.io.Lake.fingerprintCurrent(s, s"$mlt/_source_fp", dfp)) {
        TextAnalysis.writeMltIndex(table(s, dir, "documents"), mlt, mltTbl)
        graft.io.Lake.writeFingerprint(s, s"$mlt/_source_fp", dfp)
      }
      // pruneScan=false (r12, tools/RrfProbe A/B: 1.07 -> 0.58 s warm):
      // this is a BULK serve — queries are 10% of the corpus, so the
      // probed-cell union covers every cell and the pruning collect job
      // + duplicate assignment scan prune nothing. Point serves (q56)
      // keep the default.
      // sorted=false too: the fusion re-aggregates, and the serving
      // sort would survive as a mid-plan range exchange + sampling job
      val sem = Similarity.ivfTopKFromIndex(s, scratch,
          col("vec_id") % 10 === 0, k = 10, nProbe = 2, pruneScan = false,
          sorted = false)
        .select(col("qid"), col("neighbor").as("id"), col("rnk"))
      val lex = TextAnalysis.bm25MoreLikeThisFromIndex(s, mlt, mltTbl,
          col("doc_id") % 10 === 0, k = 10)
        .select(col("qid"), col("id"), col("rnk"))
      graft.ops.Fusion.rrfFuse(Seq(sem, lex), topK = 10)
        .orderBy("qid", "rnk")
    },
    Some(duckIvf +
      ", wq AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE text IS NOT NULL), " +
      s"pst AS (SELECT doc_id, unnest(${Queries.duckWordGramsList("ws", 3)}) AS term FROM wq), " +
      "dlt AS (SELECT doc_id, greatest(len(ws) - 2, 0) AS dl FROM wq), " +
      "st2 AS (SELECT count(*) AS n, sum(dl) AS sdl FROM dlt), " +
      "tfq AS (SELECT doc_id, term, count(*) AS tf FROM pst GROUP BY 1, 2), " +
      "dfq AS (SELECT term, count(*) AS df FROM tfq GROUP BY 1), " +
      "qt AS (SELECT doc_id AS qid, term FROM tfq WHERE doc_id % 10 = 0), " +
      "cnd AS (SELECT qt.qid, t.doc_id AS id, t.term, t.tf, d.dl " +
      "FROM qt JOIN tfq t USING (term) JOIN dlt d ON d.doc_id = t.doc_id " +
      "WHERE t.doc_id <> qt.qid), " +
      "ctr AS (SELECT qid, id, term, " +
      "((st2.n - dfq.df + 0.5) / (dfq.df + 0.5)) * (tf * 2.2) / " +
      "(tf + 1.2 * (0.25 + 0.75 * (dl / (CAST(st2.sdl AS DOUBLE) / st2.n)))) AS c " +
      "FROM cnd JOIN dfq USING (term) CROSS JOIN st2), " +
      "lsc AS (SELECT qid, id, " +
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY term)), " +
      "(a, b) -> a + b) AS s FROM ctr GROUP BY 1, 2), " +
      "lexr AS (SELECT qid, id, row_number() OVER (PARTITION BY qid " +
      s"ORDER BY ${dround6("s")} DESC, id) AS rnk FROM lsc), " +
      "fu AS (SELECT qid, id, rnk FROM lexr WHERE rnk <= 10 " +
      "UNION ALL SELECT qid, neighbor AS id, rnk FROM r WHERE rnk <= 10), " +
      "ff AS (SELECT qid, id, CAST(sum(1000000000000 // (60 + rnk)) AS BIGINT) AS rrf, " +
      "count(*) AS n_lists FROM fu GROUP BY 1, 2), " +
      "fr AS (SELECT qid, id, rrf, n_lists, row_number() OVER " +
      "(PARTITION BY qid ORDER BY rrf DESC, id) AS rnk FROM ff) " +
      "SELECT qid, rnk, id, rrf, n_lists FROM fr WHERE rnk <= 10 " +
      "ORDER BY qid, rnk"),
    "Hybrid retrieval: integer reciprocal-rank fusion of served-IVF " +
      "cosine top-10 and shingle-BM25 more-like-this top-10 per query " +
      "doc — the RAG hybrid-search shape, bit-reproducible")

  val all: Map[String, Q] = Map(
    "q107_hybrid_rrf" -> q107,
    "q106_cluster_split" -> q106,
    "q95_bm25" -> q95,
    "q120_term_lift" -> q120,
    "q97_fuzzy_link" -> q97,
    "q32_stream_sessionize" -> q32,
    "q20_dedup_minhash_lsh" -> q20,
    "q21_dedup_simhash" -> q21,
    "q22_dedup_ngram_jaccard" -> q22,
    "q23_dedup_embedding" -> q23,
    "q24_lang_id" -> q24,
    "q25_quality_score" -> q25,
    "q26_token_count" -> q26,
    "q27_fingerprint" -> q27,
    "q80_tfidf" -> q80,
    "q28_multimodal_features" -> q28,
    "q29_ann_ivf" -> q29,
    "q54_ann_recall" -> q54,
    "q55_ann_recall_sample" -> q55,
    "q206_beam_search" -> q206,
    "q208_beam_serve" -> q208,
    "q209_beam_append" -> q209,
    "q212_hard_negatives" -> q212,
    "q215_pq_rerank" -> q215,
    "q216_diverse_sample" -> q216,
    "q56_ann_index_roundtrip" -> q56,
    "q57_pairs_index_roundtrip" -> q57,
    "q58_dedup_index_roundtrip" -> q58,
    "q59_dedup_incremental" -> q59,
    "q60_ann_index_append" -> q60,
    "q197_stream_ivf" -> q197,
    "q198_kmeans" -> q198,
    "q199_substring_dedup" -> q199,
    "q217_line_dedup" -> q217,
    "q61_dedup_index_append" -> q61,
    "q62_dedup_clusters" -> q62,
    "q63_dedup_survivors" -> q63,
    "q64_repetition_signals" -> q64,
    "q171_explain_pairs" -> q171,
    "q169_embedding_audit" -> q169,
    "q159_prf_retrieval" -> q159,
    "q152_boilerplate" -> q152,
    "q150_phrase_probe" -> q150,
    "q149_semantic_decontaminate" -> q149,
    "q148_golden_record" -> q148,
    "q145_jaro_linkage" -> q145,
    "q142_incremental_clusters" -> q142,
    "q84_dedup_from_index" -> q84,
    "q85_semantic_dedup" -> q85,
    "q66_pii_redact" -> q66,
    "q68_srp_neardups" -> q68,
    "q70_chunk_dedup" -> q70,
    "q71_pq_topk" -> q71,
    "q73_bigram_lm" -> q73,
    "q74_ivf_pq" -> q74,
    "q75_ivf_pq_index_roundtrip" -> q75,
    "q30_table_counts" -> q30,
    "q31_session_split" -> q31,
    "q175_session_vwap" -> q175,
    "q176_cdc_chunks" -> q176,
    "q183_bm25_index" -> q183)
}
