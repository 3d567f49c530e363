package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r10 item 2): decompose q95 BM25's time and A/B the
  * candidate fusions. The shipped r10 plan evaluates the interpreted
  * WordCounts projection THREE times (stats agg, dfq build, contrib
  * probe — separate subtrees share lineage, not computation); the
  * candidates either (a) materialize one tiny per-doc frame and reuse
  * it, or (b) replace WordCounts with per-query-term token counts that
  * never build the full vocab map. Run twice, trust warm lines. */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.CatalystExpressions.register(spark)
    import graft.queries.Queries
    val docs = Queries.table(spark, dir, "documents")
    val terms = Seq("join", "scan", "spark")

    def time(name: String)(f: => Long): Unit = {
      val reps = Seq.fill(5) {
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val ts = reps.map(_._1).sorted
      println(f"[bm25] $name%-34s min ${ts.head}%6.3f s  med ${ts(2)}%6.3f s (${reps.head._2} rows)")
    }

    // stage decomposition of the CURRENT shape
    val live = docs.filter(col("text").isNotNull)
    val withTf = live.select(col("doc_id"),
        call_function("graft_word_counts", split(col("text"), " ")).as("tcs"))
      .withColumn("dl", expr("aggregate(tcs, CAST(0 AS BIGINT), (a, x) -> a + x.tf)"))
    time("stage: stats agg alone")(withTf.agg(count(lit(1)), sum(col("dl"))).count())
    time("stage: qp explode+filter alone") {
      withTf.select(col("doc_id"), col("dl"), explode_outer(col("tcs")).as("tc"))
        .select(col("doc_id"), col("dl"), col("tc.term").as("term"), col("tc.tf").as("tf"))
        .filter(col("term").isin(terms: _*)).count()
    }
    time("current bm25TopK") {
      graft.ops.TextAnalysis.bm25TopK(docs, terms, k = 25).count()
    }

    // candidate A: per-term token counts, no WordCounts, no materialization
    def perDocA: DataFrame = live.select(col("doc_id"),
      size(filter(split(col("text"), " "), w => w =!= lit(""))).cast("long").as("dl"),
      array(terms.map(t => struct(lit(t).as("term"),
        size(filter(split(col("text"), " "), w => w === lit(t))).cast("long").as("tf"))): _*).as("qtf"))
    time("candidate A (per-term counts, 3 passes)") {
      bm25From(perDocA, terms, 25).count()
    }
    // candidate B: same projection materialized once (eager localCheckpoint)
    time("candidate B (per-term counts, checkpointed)") {
      bm25From(perDocA.localCheckpoint(), terms, 25).count()
    }
    // candidate C: WordCounts once, checkpointed small frame
    time("candidate C (WordCounts, checkpointed)") {
      val pd = withTf.select(col("doc_id"), col("dl"),
        filter(col("tcs"), tc => tc.getField("term").isin(terms: _*)).as("qtf"))
        .localCheckpoint()
      bm25From(pd, terms, 25).count()
    }
    // equality check: candidate A vs current
    val cur = graft.ops.TextAnalysis.bm25TopK(docs, terms, k = 25)
      .collect().map(_.toSeq).toSeq
    val candA = bm25From(perDocA, terms, 25).collect().map(_.toSeq).toSeq
    println(s"[bm25] candidate A == current: ${cur == candA}")
    spark.stop()
  }

  /** Shared tail from a (doc_id, dl, qtf: array<struct<term,tf>>) frame. */
  private def bm25From(perDoc: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val stats = perDoc.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    val qp = perDoc.select(col("doc_id"), col("dl"), explode(col("qtf")).as("tc"))
      .select(col("doc_id"), col("dl"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      .filter(col("tf") > 0L)
    val dfq = qp.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = qp
      .join(broadcast(dfq), "term")
      .join(broadcast(stats))
      .withColumn("avgdl", col("sdl").cast("double") / col("n"))
      .withColumn("c",
        ((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
    contrib.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        expr("aggregate(transform(array_sort(collect_list(struct(term, c))), " +
          "x -> x.c), CAST(0.0 AS DOUBLE), (a, x) -> a + x)").as("s"))
      .select(col("doc_id"), col("n_terms"), round(col("s"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
  }
}
