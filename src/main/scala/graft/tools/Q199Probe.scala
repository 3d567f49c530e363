package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: stage timing + shave A/B for exactSubstringPairs (q199).
  *
  * r16 (VERDICT r15 #3): interleaved min-of-5 A/B of the production
  * pipeline against two candidate shaves —
  *   B: persist `base` (scan+split) so stage 1 (winnow fps) and stage 2
  *      (candidate gram explode) share one computed frame instead of
  *      re-reading the corpus;
  *   C: B plus the stage-1 shared-fp agg+semi-join replaced by a window
  *      count over the fp partitioning (one less join stage).
  */
object Q199Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.CatalystExpressions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm
    val L = 8; val k = 4; val w = L - k + 1

    def baseFrame = docs.filter(col("text").isNotNull)
      .select(col("doc_id").as("id"), col("text").as("txt"),
        split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= L)

    def tail(grams: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val m = grams.as("x").hint("shuffle_hash").join(grams.as("y"),
          col("x.gram") === col("y.gram") && col("x.id") < col("y.id"))
        .select(col("x.id").as("ida"), col("y.id").as("idb"),
          col("x.pos").as("i"), col("y.pos").as("j"))
      val runs = m
        .withColumn("diag", col("i") - col("j"))
        .withColumn("grp", col("i") - row_number().over(
          Window.partitionBy(col("ida"), col("idb"), col("diag"))
            .orderBy(col("i"))))
        .groupBy(col("ida"), col("idb"), col("diag"), col("grp"))
        .agg(count(lit(1)).as("cnt"))
      runs.groupBy(col("ida"), col("idb"))
        .agg((max(col("cnt")) + L - 1).as("span"))
        .orderBy("ida", "idb")
    }

    def gramsOf(base: DataFrame, candIds: DataFrame): DataFrame =
      base.join(candIds, "id")
        .select(col("id"), posexplode(
          call_function("graft_word_windows", col("txt"), lit(L), lit(1))))
        .select(col("id"), (col("pos") + 1).as("pos"), col("col").as("gram"))

    // A: the production pipeline as committed
    def variantA(): Long =
      graft.ops.Dedup.exactSubstringPairs(docs, "doc_id", "text", L).count()

    // B: base persisted and shared by stage 1 + stage 2
    def variantB(): Long = {
      val base = baseFrame.persist()
      val fps = base.select(col("id"), explode(
        call_function("graft_winnow", col("ws"), lit(k), lit(w))).as("fp"))
      val shared = fps.groupBy(col("fp")).agg(count(lit(1)).as("ndocs"))
        .filter(col("ndocs") >= 2)
      val candIds = fps.hint("shuffle_hash")
        .join(shared.select(col("fp")), "fp")
        .select(col("id")).distinct()
      val n = tail(gramsOf(base, candIds)).count()
      base.unpersist()
      n
    }

    // C: B + window-count candidates (no agg+semi-join back)
    def variantC(): Long = {
      import org.apache.spark.sql.expressions.Window
      val base = baseFrame.persist()
      val fps = base.select(col("id"), explode(
        call_function("graft_winnow", col("ws"), lit(k), lit(w))).as("fp"))
      val candIds = fps
        .withColumn("nd", count(lit(1)).over(Window.partitionBy(col("fp"))))
        .filter(col("nd") >= 2)
        .select(col("id")).distinct()
      val n = tail(gramsOf(base, candIds)).count()
      base.unpersist()
      n
    }

    // stage decomposition (one pass, committed to the BASELINE row)
    println("--- stage decomposition")
    val base = baseFrame
    val fps = base.select(col("id"), explode(
      call_function("graft_winnow", col("ws"), lit(k), lit(w))).as("fp"))
    Profile.t("s1 fps (scan+winnow)")(fps.count())
    val shared = fps.groupBy(col("fp")).agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2)
    val candIds = fps.hint("shuffle_hash")
      .join(shared.select(col("fp")), "fp").select(col("id")).distinct()
    Profile.t("s2 candIds (agg+semi-join+distinct)")(candIds.count())
    val grams = gramsOf(base, candIds)
    Profile.t("s3 grams (re-scan+explode)")(grams.count())
    Profile.t("s4 pairs (self-join+islands)")(tail(grams).count())

    // interleaved min-of-5 A/B (the PrAB method)
    println("--- interleaved A/B, min of 5")
    val reps = 5
    def time(f: () => Long): Double = {
      val t0 = System.nanoTime(); val n = f()
      val s = (System.nanoTime() - t0) / 1e9
      require(n > 0); s
    }
    val (ta, tb, tc) =
      (Array.fill(reps)(0.0), Array.fill(reps)(0.0), Array.fill(reps)(0.0))
    val (na, nb, nc) = (variantA(), variantB(), variantC())
    println(s"rows: A=$na B=$nb C=$nc")
    require(na == nb && nb == nc, "variants must agree")
    // every variant pays its whole pipeline: Materialize singletons AND
    // the session cache are cleared per timing (Spark's CacheManager
    // substitutes any still-cached canonical plan into EVERY query — a
    // later variant would silently read the earlier one's materialized
    // base and win the comparison for free)
    def cold(): Unit = {
      graft.ops.Materialize.clearAll()
      spark.sharedState.cacheManager.clearCache()
    }
    for (r <- 0 until reps) {
      cold(); ta(r) = time(variantA _)
      cold(); tb(r) = time(variantB _)
      cold(); tc(r) = time(variantC _)
      println(f"rep $r: A ${ta(r)}%.3f  B ${tb(r)}%.3f  C ${tc(r)}%.3f")
    }
    println(f"min: A ${ta.min}%.3f  B ${tb.min}%.3f  C ${tc.min}%.3f")
    spark.stop()
  }
}
