package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage decomposition of q70 (chunk dedup) — isolates the
  * scan+tiling floor from the two aggregation levels to show where the
  * remaining gap vs the oracle lives (see NOTES.md). */
object Q70Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.CatalystExpressions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm file listing

    def time(name: String)(f: => Long): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[q70probe] $name%-24s min ${reps.map(_._1).min}%6.3f s (${reps.head._2} rows)")
    }

    val chunks = call_function("graft_word_chunks", col("text"), lit(3))
    val exploded = docs.select(col("doc_id").as("id"), explode(chunks).as("chunk"))
    time("scan+tile+explode")(exploded.count())
    time("lvl1 (chunk,id) agg")(
      exploded.groupBy(col("chunk"), col("id")).agg(count(lit(1))).count())
    time("full two-level")(
      exploded.groupBy(col("chunk"), col("id")).agg(count(lit(1)).as("occ"))
        .groupBy("chunk")
        .agg(count(lit(1)).as("n_docs"), sum(col("occ")).as("n_occurrences"))
        .filter(col("n_docs") > 1).count())
    time("full + orderBy")(
      graft.ops.Dedup.chunkExactDups(docs, "doc_id", "text", 3)
        .orderBy("chunk").count())
    spark.stop()
  }
}
