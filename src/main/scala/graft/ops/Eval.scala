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
    * joins back — aggregated keys are |distinct keys| rows, so the join
    * is broadcast at any realistic key cardinality; no window over the
    * fact table, no self-join. */
  def targetEncodeLoo(df: DataFrame, idCol: Column, keyCol: Column,
      targetUnitsCol: Column): DataFrame = {
    val base = df.select(idCol.as("id"), keyCol.as("key"),
        targetUnitsCol.as("__y"))
      .filter(col("key").isNotNull && col("__y").isNotNull)
    val stats = base.groupBy(col("key"))
      .agg(sum(dec(col("__y"))).as("__sy"), count(lit(1)).as("__n"))
    base.join(broadcast(stats), "key")
      .withColumn("__num", col("__sy") - dec(col("__y")))
      .select(col("id"), col("key"),
        when(col("__n") === 1, lit(null))
          .otherwise(expr("__num div (__n - 1)"))
          .cast("long").as("loo_x1e6"))
  }
}
