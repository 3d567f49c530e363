package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation primitives — the offline metrics every training
  * pipeline computes between data curation and deployment: ROC-AUC over
  * scored examples, calibration (reliability) diagnostics, χ²
  * feature selection, and leakage-safe target encoding. The reference
  * pipeline stops at ingestion; these close the loop from the curated
  * lake to model readouts (SURVEY.md Part C).
  *
  * Numeric convention: scores enter as exact integer units (the
  * [[TimeSeries.toUnits]] µ-unit convention), every rank / count /
  * ratio is integer or DECIMAL(38,0) arithmetic, and ratios are
  * reported as floor-divided ppm (`x1e6`) — so results hash-match any
  * engine that implements integer division, with no float-ordering
  * caveats anywhere.
  */
object Eval {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Exact grouped ROC-AUC via the Mann–Whitney rank statistic with the
    * standard tie correction (tied scores share their average rank).
    * For each group: AUC = (R⁺ − P(P+1)/2) / (P·N⁻) where R⁺ is the
    * rank-sum of the positives. Average ranks over ties are half-integers,
    * so everything is carried as 2×rank and stays integral:
    * a score-value run of `n` rows starting after `cb` lower-scored rows
    * contributes `p · (2·cb + n + 1)` to 2R⁺.
    *
    * Output per group: (by…, n_pos, n_neg, auc_x1e6) with
    * auc_x1e6 = ⌊ppm AUC⌋, NULL when the group is single-class (the
    * metric is undefined — never silently 0 or 1).
    *
    * Scale shape: ONE keyed exchange on (by, score) collapses duplicate
    * scores (map-side combine — the window below then runs over DISTINCT
    * scores, not rows), one window pass per group ordered by score for
    * the cumulative counts, one final keyed agg. Rank sums are
    * DECIMAL(38,0): 2R⁺ ≤ 2·N² stays exact past 10¹⁸ rows/group, far
    * beyond task memory long before decimal range matters. */
  def rocAuc(df: DataFrame, scoreCol: Column, labelCol: Column,
      by: Seq[(String, Column)]): DataFrame = {
    val g = by.map { case (n, c) => c.as(n) }
    val gc = by.map { case (n, _) => col(n) }
    val perScore = df
      .select((g :+ scoreCol.as("__s") :+ labelCol.cast("long").as("__y")): _*)
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy((gc :+ col("__s")): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
    val w = Window.partitionBy(gc: _*).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perScore
      .withColumn("__cb", coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("__r2",
        dec(col("__p")) * (dec(col("__cb")) * 2 + dec(col("__n")) + 1))
    ranked.groupBy(gc: _*)
      .agg(sum(col("__r2")).as("__sr2"), sum(col("__p")).as("__np"),
        sum(col("__n")).as("__nn"))
      .withColumn("__num",
        (col("__sr2") - dec(col("__np")) * (dec(col("__np")) + 1)) * 1000000)
      .withColumn("__den",
        dec(col("__np")) * (dec(col("__nn")) - dec(col("__np"))) * 2)
      .select(gc ++ Seq(
        col("__np").as("n_pos"),
        (col("__nn") - col("__np")).as("n_neg"),
        when(col("__np") === 0 || col("__np") === col("__nn"), lit(null))
          .otherwise(expr("__num div __den"))
          .cast("long").as("auc_x1e6")): _*)
  }

  /** Calibration / reliability table: examples are split into `bins`
    * equal-frequency score bins (deterministic NTILE — tie-broken by the
    * caller's total-order `tieCol`, the q117 convention) and each bin
    * reports its size, exact mean predicted score, and exact positive
    * rate, both in ppm. A calibrated model's `avg_score_x1e6` tracks
    * `pos_rate_x1e6` down the bins; divergence localizes WHERE the model
    * is over/under-confident — the readout behind temperature scaling
    * and threshold picking.
    *
    * Scale note: NTILE needs a per-group total order, one window pass
    * after one exchange; with billions of rows per group, swap the exact
    * NTILE for quantile-sketch boundaries ([[Sketches.sampleSketch]]) —
    * kept exact here because the oracle contract is exactness. */
  def calibrationBins(df: DataFrame, scoreUnitsCol: Column, labelCol: Column,
      tieCol: Column, bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    df.select(scoreUnitsCol.as("__s"), labelCol.cast("long").as("__y"),
        tieCol.as("__t"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .withColumn("bin", ntile(bins).over(
        Window.orderBy(col("__s"), col("__t"))).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        expr("sum(CAST(__s AS DECIMAL(38,0))) div count(1)")
          .cast("long").as("avg_score_x1e6"),
        expr("(sum(__y) * 1000000) div count(1)").as("pos_rate_x1e6"))
      .select(col("bin"), col("n"), col("avg_score_x1e6"),
        col("pos_rate_x1e6"))
  }

  /** χ² feature selection: the top-`k` tokens most associated with each
    * label by the 2×2 contingency χ² statistic over document frequency
    * (the classic text-classification feature ranker). For token t and
    * label l with a = df(t, l), b = df(t, ¬l), c = |l| − a,
    * d = N − |l| − b:  χ² = N(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)).
    *
    * Counts are exact integers from one distinct-(doc, token) pass; the
    * χ² value itself is evaluated in DOUBLE — but as a FIXED expression
    * tree over exact integers, so any engine evaluating the same tree
    * gets bit-identical IEEE results (the q100 display-double
    * convention); ranking ties break on the token for a total order.
    * Tokens present in every document are skipped (c+d = 0 — χ²
    * undefined, and a feature with no discriminating power anyway).
    *
    * Scale shape: one distinct (token, label, doc) collapse with
    * map-side combine, one (token, label) count, one token-level
    * marginal via a window over the tiny (token, label) frame, label
    * totals broadcast, and the per-label top-k served by the bounded
    * [[graft.plans.TopKPerGroup]] operator — never a full window sort. */
  def chiSqFeatures(docs: DataFrame, textCol: Column, labelCol: Column,
      k: Int): DataFrame = {
    // one row of `docs` is one document: a synthetic per-row id is the
    // doc identity for the distinct-(doc, token) collapse
    val tl = docs
      .select(labelCol.as("label"), monotonically_increasing_id().as("__d"),
        textCol.as("__t"))
      .select(col("label"), col("__d"),
        explode(split(col("__t"), " ")).as("token"))
      .filter(col("token") =!= "")
    val tld = tl.dropDuplicates("label", "token", "__d")
    val a = tld.groupBy(col("token"), col("label"))
      .agg(count(lit(1)).as("a"))
    val wTok = Window.partitionBy(col("token"))
    val labelTotals = docs.groupBy(labelCol.as("label"))
      .agg(count(lit(1)).as("nl"))
    val nTotal = docs.agg(count(lit(1)).as("__nn"))
    val d = (c: Column) => c.cast("double")
    val scored = a
      .withColumn("ta", sum(col("a")).over(wTok))
      .join(broadcast(labelTotals), "label")
      .crossJoin(broadcast(nTotal))
      .filter(col("ta") < col("__nn")) // in every doc -> c+d = 0, skip
      .withColumn("b", col("ta") - col("a"))
      .withColumn("c", col("nl") - col("a"))
      .withColumn("dd", col("__nn") - col("nl") - col("b"))
      .withColumn("chi2", round(
        (d(col("__nn")) *
          (d(col("a")) * d(col("dd")) - d(col("b")) * d(col("c"))) *
          (d(col("a")) * d(col("dd")) - d(col("b")) * d(col("c")))) /
          ((d(col("a")) + d(col("b"))) * (d(col("c")) + d(col("dd"))) *
            (d(col("a")) + d(col("c"))) * (d(col("b")) + d(col("dd")))),
        6))
      .select(col("label"), col("token"), col("a").as("df_in"),
        col("b").as("df_out"), col("chi2"))
    graft.plans.TopKPerGroup.topKPerGroup(scored, Seq("label"),
      Seq(col("chi2").desc, col("token").asc), k)
  }

  /** Offline RANKING evaluation of a top-k recommender against held-out
    * relevance — the temporal-split readout (train on the past, score
    * against the future) every production recommender ships behind.
    * `recs` is a (part, rec, cooc) top-k frame (rank = cooc desc, rec
    * asc — [[Recs.coVisitation]]'s serve order); `testRelevant` is the
    * symmetric distinct (part, rec) relevance set from the held-out
    * window ([[Recs.coOccurring]]). Per part:
    *   - `hits`      — relevant recommendations among the k,
    *   - `rr_x1e6`   — reciprocal rank of the FIRST hit (0 when none),
    *   - `ndcg_x1e6` — binary-gain NDCG@k, ideal = all of the part's
    *     held-out partners ranked first (NULL when the part has no
    *     held-out partner — "unmeasurable", never a fabricated 0).
    *
    * Discounts 1/log2(r+1) and 1/r enter as ppm INTEGER constants
    * (driver-computed literals, the q144 Benford-constants pattern), so
    * the whole metric is integer arithmetic and replays exactly in any
    * SQL engine.
    *
    * Scale shape: rank assignment is a window over the ≤ k·|parts| rec
    * frame (already top-k-bounded — never the fact table), relevance is
    * one equi-join, the per-part fold one keyed agg, and the ideal-DCG
    * lookup a broadcast-free CASE over the part's held-out partner
    * count. */
  def recEval(recs: DataFrame, testRelevant: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1, 100], got $k")
    def log2(x: Double): Double = Math.log(x) / Math.log(2.0)
    val disc = (1 to k).map(r => r -> Math.round(1e6 / log2(r + 1.0)))
    val rrd = (1 to k).map(r => r -> Math.round(1e6 / r))
    val cum = disc.scanLeft(0 -> 0L) { case ((_, acc), (r, d)) =>
      r -> (acc + d)
    }.toMap
    def caseOf(pairs: Seq[(Int, Long)], on: Column): Column =
      pairs.foldLeft(lit(0L)) { case (acc, (r, v)) =>
        when(on === r, lit(v)).otherwise(acc)
      }
    val w = Window.partitionBy(col("part"))
      .orderBy(col("cooc").desc, col("rec").asc)
    val ranked = recs.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
    val rel = testRelevant.select(col("part"), col("rec"))
      .withColumn("__hit", lit(1L))
    val scored = ranked.join(rel, Seq("part", "rec"), "left")
      .withColumn("__hit", coalesce(col("__hit"), lit(0L)))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_recs"),
        sum(col("__hit")).as("hits"),
        sum(col("__hit") * caseOf(disc, col("__rk"))).as("__dcg"),
        max(col("__hit") * caseOf(rrd, col("__rk"))).as("rr_x1e6"))
    val nrel = testRelevant.groupBy(col("part"))
      .agg(count(lit(1)).as("__nrel"))
    val ideal = caseOf((1 to k).map(r => r -> cum(r)),
      least(coalesce(col("__nrel"), lit(0L)), lit(k.toLong)))
    scored.join(nrel, Seq("part"), "left")
      .withColumn("__idcg", ideal)
      .select(col("part"), col("n_recs"), col("hits"), col("rr_x1e6"),
        when(col("__idcg") === 0, lit(null))
          .otherwise(expr("(__dcg * 1000000) div __idcg"))
          .cast("long").as("ndcg_x1e6"))
  }

  /** CLASSIFIER AGREEMENT audit: per-class precision / recall / F1 plus
    * Cohen's κ between a true labeling and a prediction — the readout
    * for auto-labelers, weak supervision, and annotator agreement
    * (κ corrects raw agreement for chance: κ = (p_o − p_e)/(1 − p_e),
    * p_e from the label marginals). One row per class (precision NULL
    * when the class is never predicted — undefined, not 0) and a
    * `__all` rollup (the q133 convention) carrying micro-averaged
    * metrics — equal to accuracy for single-label classification — and
    * the κ ppm, exact: κ_x1e6 = (N·agree − Σ nt·np)·10⁶ div (N² −
    * Σ nt·np), every term integral.
    *
    * Scale shape: ONE keyed exchange collapses the fact table to the
    * ≤ |classes|² confusion matrix (map-side combine); the matrix is
    * localCheckpoint'd (the q95 one-materialization pattern — three
    * marginal consumers must not re-scan the corpus) and every
    * downstream step runs on those few rows. */
  def classifierAudit(df: DataFrame, trueCol: Column,
      predCol: Column): DataFrame = {
    val conf = df.select(trueCol.as("__t"), predCol.as("__p"))
      .filter(col("__t").isNotNull && col("__p").isNotNull)
      .groupBy(col("__t"), col("__p")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val nt = conf.groupBy(col("__t").as("label")).agg(sum("c").as("n_true"))
    val np = conf.groupBy(col("__p").as("label")).agg(sum("c").as("n_pred"))
    val tp = conf.filter(col("__t") === col("__p"))
      .select(col("__t").as("label"), col("c").as("tp"))
    val cls = nt.join(np, Seq("label"), "full").join(tp, Seq("label"), "left")
      .na.fill(0L, Seq("n_true", "n_pred", "tp"))
    val perClass = cls.select(col("label"), col("n_true"), col("n_pred"),
      col("tp"),
      when(col("n_pred") === 0, lit(null))
        .otherwise(expr("(tp * 1000000) div n_pred")).cast("long")
        .as("precision_x1e6"),
      when(col("n_true") === 0, lit(null))
        .otherwise(expr("(tp * 1000000) div n_true")).cast("long")
        .as("recall_x1e6"),
      when(col("n_true") + col("n_pred") === 0, lit(null))
        .otherwise(expr("(2 * tp * 1000000) div (n_true + n_pred)"))
        .cast("long").as("f1_x1e6"),
      lit(null).cast("long").as("kappa_x1e6"))
    val rollup = cls.agg(
        sum(col("n_true")).as("__n"), sum(col("tp")).as("__agree"),
        sum(dec(col("n_true")) * dec(col("n_pred"))).as("__pe"))
      .select(lit("__all").as("label"), col("__n").as("n_true"),
        col("__n").as("n_pred"), col("__agree").as("tp"),
        expr("(__agree * 1000000) div __n").cast("long")
          .as("precision_x1e6"),
        expr("(__agree * 1000000) div __n").cast("long").as("recall_x1e6"),
        expr("(__agree * 1000000) div __n").cast("long").as("f1_x1e6"),
        when(dec(col("__n")) * dec(col("__n")) === col("__pe"), lit(null))
          .otherwise(expr(
            "((CAST(__n AS DECIMAL(38,0)) * __agree - __pe) * 1000000) " +
              "div (CAST(__n AS DECIMAL(38,0)) * __n - __pe)"))
          .cast("long").as("kappa_x1e6"))
    perClass.unionAll(rollup)
  }

  /** Leakage-safe LEAVE-ONE-OUT target encoding: each row's categorical
    * key is replaced by the mean target of the OTHER rows sharing the
    * key — the encoding that lets a model consume high-cardinality keys
    * without memorizing its own row (plain mean encoding leaks the
    * row's own target; LOO is the standard counter). Exact integral:
    * target in µ-units, loo_x1e6 = ⌊(S_key − y) / (n_key − 1)⌋; keys
    * seen once encode NULL (no other rows exist — explicitly absent,
    * for the consumer's prior-imputation policy, never a fabricated 0).
    *
    * Scale shape: one keyed agg for (S, n) per key, then the agg frame
    * joins back. NO broadcast hint on the stats frame: LOO encoding
    * exists precisely FOR high-cardinality keys (user ids, URLs), where
    * a forced broadcast of tens of millions of (key, S, n) rows OOMs
    * the driver — AQE sizes the built side at runtime and broadcasts
    * exactly when it fits (below spark.sql.autoBroadcastJoinThreshold),
    * falling back to a shuffle join on the same key partitioning the
    * agg just produced; no window over the fact table, no self-join. */
  def targetEncodeLoo(df: DataFrame, idCol: Column, keyCol: Column,
      targetUnitsCol: Column): DataFrame = {
    val base = df.select(idCol.as("id"), keyCol.as("key"),
        targetUnitsCol.as("__y"))
      .filter(col("key").isNotNull && col("__y").isNotNull)
    val stats = base.groupBy(col("key"))
      .agg(sum(dec(col("__y"))).as("__sy"), count(lit(1)).as("__n"))
    base.join(stats, "key")
      .withColumn("__num", col("__sy") - dec(col("__y")))
      .select(col("id"), col("key"),
        when(col("__n") === 1, lit(null))
          .otherwise(expr("__num div (__n - 1)"))
          .cast("long").as("loo_x1e6"))
  }
}
