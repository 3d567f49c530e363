package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Co-occurrence recommendation mining ("frequently bought together") —
  * the collaborative-filtering staple every commerce/retrieval stack
  * derives from transaction logs. The reference pipeline stops at bar
  * ingestion; this is the item-affinity capability class over the same
  * lake (SURVEY.md Part C).
  *
  * Scale shape: ONE keyed exchange on the basket id collapses each basket
  * to its distinct sorted item array (map-side combine on collect_set),
  * the quadratic pair generation happens IN-ROW through the compiled
  * `graft_long_pairs` kernel (never a self-join — a self-join shuffles the
  * item table twice and re-sorts both sides for the same pairs), and the
  * pair counts take one more keyed exchange with map-side partial counts.
  * The top-k per item then rides the custom TopKPerGroup physical operator
  * (exchange bounded by items·partitions·k, plans/TopKPerGroup.scala) —
  * never a full window sort. Hot baskets are the one quadratic hazard (a
  * bot cart with 10⁵ distinct items is 5·10⁹ pairs in one task):
  * `maxBasket` slices each basket to its lowest item ids BEFORE pair
  * generation, deterministic and SQL-replayable, with the truncation bias
  * documented here rather than hidden (industry practice downsamples big
  * baskets; the slice keeps the oracle exact).
  */
object Recs {

  /** Top-`k` co-visited items per item: baskets → distinct item pairs →
    * symmetric co-occurrence counts → k strongest neighbors (count desc,
    * item id asc — a total order). Output columns: (part, rec, cooc).
    *
    * @param maxBasket baskets with more distinct items are sliced to the
    *                  `maxBasket` smallest ids before pair generation
    *                  (quadratic-blowup guard; non-binding default) */
  def coVisitation(items: DataFrame, basketCol: String, itemCol: String,
      k: Int, maxBasket: Int = 10000): DataFrame = {
    require(maxBasket <= 20000,
      s"maxBasket $maxBasket exceeds the pair kernel's 20000-item bound")
    graft.functions.CatalystExpressions.register(items.sparkSession)
    val baskets = items
      .select(col(basketCol).as("bk"), col(itemCol).cast("long").as("it"))
      .filter(col("it").isNotNull)
      .groupBy(col("bk"))
      .agg(slice(sort_array(collect_set(col("it"))), 1, maxBasket).as("its"))
    val cooc = baskets
      .select(explode(call_function("graft_long_pairs", col("its"))).as("p"))
      .select(col("p.a").as("pa"), col("p.b").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cooc"))
    serveTopK(cooc, k)
  }

  /** Top-`k` neighbor serve from a half-matrix of (pa, pb, cooc) counts
    * (pa < pb): symmetrize and take the k strongest per item through the
    * bounded TopKPerGroup operator. Shared by the batch miner above and
    * the streaming maintainer ([[graft.streaming.CoVisitStream]], whose
    * emitted-pair aggregation produces the same half-matrix). */
  def serveTopK(cooc: DataFrame, k: Int): DataFrame = {
    val sym = cooc.select(col("pa").as("part"), col("pb").as("rec"), col("cooc"))
      .unionAll(cooc.select(col("pb").as("part"), col("pa").as("rec"), col("cooc")))
    graft.plans.TopKPerGroup.topKPerGroup(sym, Seq("part"),
      Seq(col("cooc").desc, col("rec").asc), k)
  }

  /** Window-based reference formulation (row_number over a full sort) —
    * the plan TopKPerGroup exists to avoid; kept for the equivalence
    * spec. */
  private[graft] def coVisitationWindow(items: DataFrame, basketCol: String,
      itemCol: String, k: Int, maxBasket: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = coVisitationPairs(items, basketCol, itemCol, maxBasket)
    val w = Window.partitionBy(col("part"))
      .orderBy(col("cooc").desc, col("rec").asc)
    base.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .drop("rn")
  }

  /** Symmetric DISTINCT co-occurrence partners (part, rec) — the
    * held-out relevance frame for offline recommender evaluation
    * ([[Eval.recEval]]): (p, r) present iff p and r share a basket. */
  def coOccurring(items: DataFrame, basketCol: String, itemCol: String,
      maxBasket: Int = 10000): DataFrame =
    coVisitationPairs(items, basketCol, itemCol, maxBasket)
      .select(col("part"), col("rec"))

  private def coVisitationPairs(items: DataFrame, basketCol: String,
      itemCol: String, maxBasket: Int): DataFrame = {
    graft.functions.CatalystExpressions.register(items.sparkSession)
    val baskets = items
      .select(col(basketCol).as("bk"), col(itemCol).cast("long").as("it"))
      .filter(col("it").isNotNull)
      .groupBy(col("bk"))
      .agg(slice(sort_array(collect_set(col("it"))), 1, maxBasket).as("its"))
    val cooc = baskets
      .select(explode(call_function("graft_long_pairs", col("its"))).as("p"))
      .select(col("p.a").as("pa"), col("p.b").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cooc"))
    cooc.select(col("pa").as("part"), col("pb").as("rec"), col("cooc"))
      .unionAll(cooc.select(col("pb").as("part"), col("pa").as("rec"), col("cooc")))
  }
}
