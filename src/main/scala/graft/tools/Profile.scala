package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: stage-level timing for operator pipelines (run manually,
  * not part of the driver contract). */
object Profile {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.CatalystExpressions.register(spark)
    import graft.functions.TextFunctions._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val shingle = wordShingles(_: org.apache.spark.sql.Column, 5)
    val threshold = 0.5

    // warm
    docs.count()

    for (round <- 1 to 2) {
      println(s"--- round $round")
      val sets = docs.select(col("doc_id").as("id"), col("lang").as("blk"),
        shingle(col("text")).as("sh"))
      t("sets")(sets.count())
      val nsh = size(col("sh"))
      val prefixLen = (nsh - ceil(nsh * threshold) + 1).cast("int")
      val prefix = sets.select(col("id"), col("blk"),
        explode(slice(array_sort(col("sh")), lit(1), prefixLen)).as("g"))
      t("prefix")(prefix.count())
      // shuffle_hash hint mirrors Dedup.ngramJaccardPairs — Profile must
      // time the plan production actually runs (exchange-reused shuffle,
      // not a per-side-recomputing broadcast)
      val cand = prefix.as("x").hint("shuffle_hash").join(prefix.as("y"),
          col("x.g") === col("y.g") && col("x.blk") === col("y.blk") &&
          col("x.id") < col("y.id"))
        .select(col("x.id").as("da"), col("y.id").as("db"))
        .distinct()
      t("cand")(cand.count())
      val verified = cand
        .join(sets.select(col("id").as("da"), col("sh").as("sa")), "da")
        .join(sets.select(col("id").as("db"), col("sh").as("sb")), "db")
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
        .withColumn("jac", col("inter") / (size(col("sa")) + size(col("sb")) - col("inter")))
        .filter(col("jac") >= threshold)
      t("verified")(verified.count())
    }
    spark.stop()
  }
}
