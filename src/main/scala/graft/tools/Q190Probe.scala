package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (VERDICT r15 #4): interleaved min-of-5 A/B for q190
  * (rec-eval) — the TopKPerGroup-served co-visitation mine (production)
  * against the row_number-window mine (`Recs.coVisitationWindow`, the
  * formulation TopKPerGroup exists to avoid) — plus the stage-floor
  * decomposition (train mine / test relevance mine / eval epilogue).
  * recEval's own rank window runs over the ALREADY top-k-bounded rec
  * frame (≤ k·|parts| rows) and needs the rank VALUES for the DCG
  * discounts, so it is not a TopKPerGroup candidate; the mines are
  * where the fact-table work is.
  */
object Q190Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.CatalystExpressions.register(spark)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.count() // warm
    def train = li.filter(col("l_shipdate") < lit("2000-07-01"))
    def test = li.filter(col("l_shipdate") >= lit("2000-07-01"))

    def variantA(): Long = { // production: TopKPerGroup mine
      val recs = graft.ops.Recs.coVisitation(train, "l_orderkey",
        "l_partkey", k = 5)
      val rel = graft.ops.Recs.coOccurring(test, "l_orderkey", "l_partkey")
      graft.ops.Eval.recEval(recs, rel, k = 5).count()
    }
    def variantB(): Long = { // window mine
      val recs = graft.ops.Recs.coVisitationWindow(train, "l_orderkey",
        "l_partkey", k = 5)
      val rel = graft.ops.Recs.coOccurring(test, "l_orderkey", "l_partkey")
      graft.ops.Eval.recEval(recs, rel, k = 5).count()
    }

    println("--- stage decomposition (cumulative-cost probes)")
    Profile.t("train mine (pairs+agg+topk)")(graft.ops.Recs.coVisitation(
      train, "l_orderkey", "l_partkey", k = 5).count())
    Profile.t("test relevance (pairs distinct)")(graft.ops.Recs.coOccurring(
      test, "l_orderkey", "l_partkey").count())
    Profile.t("full eval")(variantA())

    println("--- interleaved A/B, min of 5")
    def time(f: () => Long): Double = {
      val t0 = System.nanoTime(); val n = f()
      val s = (System.nanoTime() - t0) / 1e9
      require(n > 0); s
    }
    val reps = 5
    val ta = Array.fill(reps)(0.0); val tb = Array.fill(reps)(0.0)
    require(variantA() == variantB(), "variants must agree on row count")
    for (r <- 0 until reps) {
      ta(r) = time(variantA _)
      tb(r) = time(variantB _)
      println(f"rep $r: A(topk) ${ta(r)}%.3f  B(window) ${tb(r)}%.3f")
    }
    println(f"min: A(topk) ${ta.min}%.3f  B(window) ${tb.min}%.3f")
    spark.stop()
  }
}
