package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: A/B the TF-IDF formulations in one session — the r8
  * explode→groupBy(doc,term) plan vs the r10 in-row WordCounts plan —
  * plus exchange-count and reuse checks on the live plan. */
object TfidfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.CatalystExpressions.register(spark)
    import graft.functions.TextFunctions.words
    import org.apache.spark.sql.expressions.Window

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm file cache

    def oldPlan(k: Int): DataFrame = {
      val live = docs.filter(col("text").isNotNull)
      val terms = live
        .select(col("doc_id"), explode(words(col("text"))).as("term"))
        .filter(length(col("term")) > 0)
      val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = live.agg(count(lit(1)).as("n"))
      val scored = tf.join(df, "term").join(broadcast(n))
        .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term").asc)
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"), col("score"))
    }

    def t(name: String)(f: => DataFrame): Unit = {
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime()
        f.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[tfidf] $name%-10s min ${ts.head}%6.3f s median ${ts(2)}%6.3f s")
    }
    def variantC(k: Int): DataFrame = {
      val live = docs.filter(col("text").isNotNull)
      val pairs = live
        .select(col("doc_id"), explode(call_function("graft_word_counts",
          words(col("text")))).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      val df = pairs.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = live.agg(count(lit(1)).as("n"))
      val scored = pairs.join(df, "term").join(broadcast(n))
        .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term").asc)
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"), col("score"))
    }
    // interleave to share host phases
    for (_ <- 1 to 2) {
      t("old")(oldPlan(3))
      t("new")(graft.ops.TextAnalysis.tfIdfTopK(docs, 3))
      t("aqeC")(variantC(3))
    }
    val newDf = graft.ops.TextAnalysis.tfIdfTopK(docs, 3)
    newDf.count()
    val plan = newDf.queryExecution.executedPlan.toString
    println("[tfidf] new exchanges=" + "Exchange".r.findAllIn(plan).size +
      " reused=" + plan.contains("ReusedExchange") +
      " bhj=" + plan.contains("BroadcastHashJoin"))
    // value parity old vs new
    val a = oldPlan(3).collect().map(_.toString).sorted.toSeq
    val b = newDf.collect().map(_.toString).sorted.toSeq
    println("[tfidf] parity=" + (a == b) + " rows=" + a.size)
    spark.stop()
  }
}
