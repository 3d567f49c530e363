package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** DURABLE co-visitation index — the mine-once / serve-many form of
    * [[coVisitation]] (the q105/q183 build-at-ingest convention): the
    * symmetric (part, rec, cooc) count matrix lands as a part-bucketed,
    * bucket-sorted catalog table, so every later serve
    * ([[serveCoVisitTopK]]) is a placed scan + the bounded TopKPerGroup
    * operator with ZERO exchanges — the r16 A/B proved the in-session
    * mine's three exchanges are volume-minimal, which makes prepaying
    * them the only remaining lever (VERDICT r16 #2). At 100 TB the
    * index is ingest-maintained state like the shingle/IVF indexes;
    * recommendation queries never touch the basket log. */
  def writeCoVisitIndex(items: DataFrame, basketCol: String, itemCol: String,
      tableName: String, buckets: Int, maxBasket: Int = 10000): Unit = {
    require(maxBasket <= 20000,
      s"maxBasket $maxBasket exceeds the pair kernel's 20000-item bound")
    val sym = coVisitationPairs(items, basketCol, itemCol, maxBasket)
    graft.io.Lake.writeBucketed(sym.repartition(buckets, col("part")),
      tableName, "part", buckets, Some("part"))
  }

  /** Top-`k` neighbors per item from a [[writeCoVisitIndex]] table:
    * the scan arrives hash-placed on `part` (bucketed), which satisfies
    * TopKPerGroup's required distribution outright — no exchange, no
    * window sort, output bounded by items·k (spec-asserted plan
    * shape). Same result set as [[coVisitation]] over the mined data
    * (shares q184's oracle as q207). */
  def serveCoVisitTopK(spark: SparkSession, tableName: String,
      k: Int): DataFrame =
    graft.plans.TopKPerGroup.topKPerGroup(spark.table(tableName),
      Seq("part"), Seq(col("cooc").desc, col("rec").asc), k)

  /** Incremental maintenance: merge the pair counts of NEW COMPLETE
    * baskets into the index (count matrices are additive — the same
    * fact [[graft.streaming.CoVisitStream]]'s state machine exploits,
    * so its per-batch pair emissions can drain here). The merge is
    * read-modify-write like [[graft.io.Versioned.applyChanges]]:
    * current counts + delta counts re-aggregate and swap-publish as
    * the new bucketed table; the merged frame materializes
    * (localCheckpoint) BEFORE the rewrite drops the table it reads.
    * Contract: a basket id must not span calls (a re-sent basket would
    * double-count its pairs — CoVisitStream's state handles mid-basket
    * growth upstream and emits each pair exactly once). */
  def appendToCoVisitIndex(items: DataFrame, tableName: String,
      basketCol: String, itemCol: String, buckets: Int,
      maxBasket: Int = 10000): Unit = {
    val spark = items.sparkSession
    val delta = coVisitationPairs(items, basketCol, itemCol, maxBasket)
    val merged = spark.table(tableName).unionByName(delta)
      .groupBy(col("part"), col("rec")).agg(sum(col("cooc")).as("cooc"))
      .localCheckpoint()
    graft.io.Lake.writeBucketed(merged.repartition(buckets, col("part")),
      tableName, "part", buckets, Some("part"))
  }

  /** Symmetric (part, rec, cooc) pair counts of one corpus slice — the
    * shared delta projection behind the batch miner, the durable index
    * build/append, and the exactly-once streaming maintainer
    * ([[graft.streaming.StreamSink.toCoVisitPairs]]). Counts are
    * distributive sums over baskets, so any basket-complete partition of
    * the corpus sums back to the whole-corpus matrix. */
  private[graft] def coVisitationPairs(items: DataFrame, basketCol: String,
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
