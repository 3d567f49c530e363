package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion — the step every RAG / retrieval
  * training stack runs after its lexical (BM25) and semantic (ANN)
  * searches return their per-query top-k lists: combine rankings that
  * score on incomparable scales by RANK alone.
  *
  * Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09):
  * `score(d) = Σ_lists 1/(k0 + rank_list(d))` with the standard
  * k0 = 60. Kept in FIXED-POINT integer units (1e12 · 1/(k0+rank),
  * truncating division) so the fusion is bit-reproducible under any
  * shuffle order and exactly SQL-replayable — the q93/q100 integer-
  * arithmetic rule applied to retrieval.
  *
  * Scale shape: inputs are already per-query top-k lists, so the whole
  * fusion touches O(|queries| · k · lists) rows — one keyed aggregation
  * (qid, id) + one k-bounded window per query; the expensive work lives
  * in the upstream rankers. */
object Fusion {

  /** 1e12 fixed-point scale: k0+rank ≤ ~1000 keeps every reciprocal
    * ≥ 1e9 units with 9+ significant digits, and a sum over any
    * realistic list count stays far under 2⁶³. */
  val RrfScale: Long = 1000000000000L

  /** Fuse per-query rankings into one top-`topK` list per query.
    * Every input frame carries (qid, id, rnk) with rnk 1-indexed;
    * a (qid, id) appearing in several lists sums its reciprocals.
    * Output: (qid, rnk, id, rrf, n_lists), rrf in 1e-12 units, ties
    * broken by id so the cut is total-ordered and engine-independent. */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(topK >= 1 && k0 >= 0, s"invalid topK=$topK k0=$k0")
    val u = rankings.map(_.select(col("qid"), col("id"), col("rnk")))
      .reduce(_ unionAll _)
    // ONE exchange serves both tails (the bm25MoreLikeThis convention):
    // hash(qid) placement satisfies the (qid, id) aggregation's
    // clustering AND the rank window's, so the explicit repartition
    // replaces two back-to-back shuffles of the fused frame with one
    val fused = u.repartition(col("qid")).groupBy(col("qid"), col("id"))
      .agg(sum(expr(s"$RrfScale div (${k0}L + rnk)")).as("rrf"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("id").asc)
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk"), col("id"), col("rrf"), col("n_lists"))
  }
}
