package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does q107's time go — index write, IVF serve, the
  * BM25 more-like-this stages, fusion. */
object RrfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", graft.queries.Queries.scratchRoot + "/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.CatalystExpressions.register(spark)
    import graft.ops.{Fusion, Similarity, TextAnalysis}
    import graft.queries.Queries
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[rrf] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.3f s ($n rows)")
    }
    val scratch = s"${Queries.scratchRoot}/rrfprobe-index"
    t("writeIndex") {
      Similarity.writeIndex(Queries.table(spark, dir, "embeddings"), scratch, 16); 0L
    }
    t("ivf serve k=10") {
      Similarity.ivfTopKFromIndex(spark, scratch, col("vec_id") % 10 === 0,
        k = 10, nProbe = 2).count()
    }
    t("ivf serve k=10 2nd") {
      Similarity.ivfTopKFromIndex(spark, scratch, col("vec_id") % 10 === 0,
        k = 10, nProbe = 2).count()
    }
    t("ivf serve noprune") {
      Similarity.ivfTopKFromIndex(spark, scratch, col("vec_id") % 10 === 0,
        k = 10, nProbe = 2, pruneScan = false).count()
    }
    t("ivf serve noprune 2nd") {
      Similarity.ivfTopKFromIndex(spark, scratch, col("vec_id") % 10 === 0,
        k = 10, nProbe = 2, pruneScan = false).count()
    }
    val docs = Queries.table(spark, dir, "documents")
    // MLT stage decomposition
    val live = docs.filter(col("text").isNotNull)
    val ws = split(col("text"), " ")
    val grams = when(size(ws) >= 3,
      call_function("graft_word_windows", col("text"), lit(3), lit(1)))
      .otherwise(array().cast("array<string>"))
    t("stage: posted checkpoint") {
      live.select(col("doc_id").as("id"), (col("doc_id") % 10 === 0).as("__isq"),
          greatest(size(ws) - 2, lit(0)).cast("long").as("dl"),
          explode_outer(call_function("graft_word_counts", grams)).as("tc"))
        .select(col("id"), col("__isq"), col("dl"),
          col("tc.term").as("term"), col("tc.tf").as("tf"))
        .localCheckpoint().count()
    }
    // decompose MLT internals: posting frame -> joins -> agg variants
    locally {
      val posted = live.select(col("doc_id").as("id"),
          (col("doc_id") % 10 === 0).as("__isq"),
          greatest(size(ws) - 2, lit(0)).cast("long").as("dl"),
          explode_outer(call_function("graft_word_counts", grams)).as("tc"))
        .select(col("id"), col("__isq"), col("dl"),
          col("tc.term").as("term"), col("tc.tf").as("tf"))
        .localCheckpoint()
      val stats = posted.groupBy(col("id")).agg(first(col("dl")).as("dl"))
        .agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
      val terms = posted.filter(col("term").isNotNull)
      val dfq = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val qt = terms.filter(col("__isq")).select(col("id").as("qid"), col("term"))
      val contrib = qt
        .join(terms.select(col("id"), col("dl"), col("term"), col("tf")), "term")
        .filter(col("id") =!= col("qid"))
        .join(dfq, "term")
        .join(broadcast(stats))
        .withColumn("c",
          ((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
              (col("dl") / (col("sdl").cast("double") / col("n"))))))
      t("mlt: contrib rows only")(contrib.count())
      t("mlt: agg plain sum") {
        contrib.repartition(col("qid")).groupBy(col("qid"), col("id"))
          .agg(count(lit(1)).as("n_terms"), sum(col("c")).as("s")).count()
      }
      t("mlt: agg sorted fold") {
        contrib.repartition(col("qid")).groupBy(col("qid"), col("id"))
          .agg(count(lit(1)).as("n_terms"),
            expr("aggregate(transform(array_sort(collect_list(struct(term, c))), " +
              "x -> x.c), CAST(0.0 AS DOUBLE), (a, x) -> a + x)").as("s")).count()
      }
    }
    // variant: no checkpoint — tokenize re-runs per consumer but the
    // whole query stays one job (no materialization barrier)
    locally {
      val postedNC = live.select(col("doc_id").as("id"),
          (col("doc_id") % 10 === 0).as("__isq"),
          greatest(size(ws) - 2, lit(0)).cast("long").as("dl"),
          explode_outer(call_function("graft_word_counts", grams)).as("tc"))
        .select(col("id"), col("__isq"), col("dl"),
          col("tc.term").as("term"), col("tc.tf").as("tf"))
      val stats = live.agg(count(lit(1)).as("n"),
        sum(greatest(size(ws) - 2, lit(0)).cast("long")).as("sdl"))
      val terms = postedNC.filter(col("term").isNotNull)
      val dfq = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val qt = terms.filter(col("__isq")).select(col("id").as("qid"), col("term"))
      val contrib = qt
        .join(terms.select(col("id"), col("dl"), col("term"), col("tf")), "term")
        .filter(col("id") =!= col("qid"))
        .join(dfq, "term")
        .join(broadcast(stats))
        .withColumn("c",
          ((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
              (col("dl") / (col("sdl").cast("double") / col("n"))))))
      t("mlt variant: no checkpoint") {
        contrib.repartition(col("qid")).groupBy(col("qid"), col("id"))
          .agg(count(lit(1)).as("n_terms"),
            expr("aggregate(transform(array_sort(collect_list(struct(term, c))), " +
              "x -> x.c), CAST(0.0 AS DOUBLE), (a, x) -> a + x)").as("s"))
          .count()
      }
    }
    t("full bm25MoreLikeThis") {
      TextAnalysis.bm25MoreLikeThis(docs, col("doc_id") % 10 === 0, k = 10).count()
    }
    t("full bm25MoreLikeThis 2nd") {
      TextAnalysis.bm25MoreLikeThis(docs, col("doc_id") % 10 === 0, k = 10).count()
    }
    t("full q107") {
      graft.SparkEntry.queries("q107_hybrid_rrf")(spark, dir).count()
    }
    t("full q107 2nd") {
      graft.SparkEntry.queries("q107_hybrid_rrf")(spark, dir).count()
    }
    locally {
      val plan = graft.SparkEntry.queries("q107_hybrid_rrf")(spark, dir)
        .queryExecution.optimizedPlan.toString
      val sorts = plan.linesIterator.count(_.contains("Sort "))
      val exch = graft.SparkEntry.queries("q107_hybrid_rrf")(spark, dir)
        .queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
      println(s"[rrf] optimized Sort nodes: $sorts, executed Exchange lines: $exch")
    }
    spark.stop()
  }
}
