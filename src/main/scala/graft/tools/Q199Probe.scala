package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage timing for exactSubstringPairs (q199). */
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
    val sep = "\u001f"
    for (round <- 1 to 3) {
      println(s"--- round $round")
      val base = docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("id"), col("text").as("txt"),
          split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= L)
      val fps = base.select(col("id"), explode(
        call_function("graft_winnow", col("ws"), lit(k), lit(w))).as("fp"))
      Profile.t("fps")(fps.count())
      val shared = fps.groupBy(col("fp")).agg(count(lit(1)).as("ndocs"))
        .filter(col("ndocs") >= 2)
      Profile.t("shared")(shared.count())
      val candIds = fps.hint("shuffle_hash")
        .join(shared.select(col("fp")), "fp")
        .select(col("id")).distinct()
      Profile.t("candIds")(candIds.count())
      val grams = base.join(candIds, "id")
        .select(col("id"), posexplode(
          call_function("graft_word_windows", col("txt"), lit(L), lit(1))))
        .select(col("id"), (col("pos") + 1).as("pos"), col("col").as("gram"))
      Profile.t("grams")(grams.count())
      val m = grams.as("x").hint("shuffle_hash").join(grams.as("y"),
          col("x.gram") === col("y.gram") && col("x.id") < col("y.id"))
        .select(col("x.id").as("ida"), col("y.id").as("idb"),
          col("x.pos").as("i"), col("y.pos").as("j"))
      Profile.t("m")(m.count())
      Profile.t("full")(graft.ops.Dedup.exactSubstringPairs(
        docs, "doc_id", "text", 8).count())
    }
    spark.stop()
  }
}
