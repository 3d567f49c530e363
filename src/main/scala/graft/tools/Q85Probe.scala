package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: stage decomposition of q85 (semantic dedup served from the
  * durable IVF index) — where do its ~4 s go? Times, min-of-5 after warm:
  *   assign  — reading the lake assignment alone (noop sink)
  *   pairs   — cosinePairsBlockedFromIndex materialized (noop sink)
  *   cc      — connectedComponents over the (pre-materialized) pair set
  *   full    — the declared q85 (pairs + CC + survivors agg)
  * Also prints n, |pairs|, and cell histogram so the candidate volume is
  * on record. Usage: runMain graft.tools.Q85Probe [--sf <dir>] */
object Q85Probe {
  def main(args: Array[String]): Unit = {
    val sfIdx = args.indexOf("--sf")
    if (sfIdx >= 0 && sfIdx + 1 >= args.length) {
      System.err.println("Q85Probe: --sf needs a directory")
      sys.exit(2)
    }
    val dir = if (sfIdx >= 0) args(sfIdx + 1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.queries.Queries.scratchRoot + "/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.CatalystExpressions.register(spark)
    import graft.ops.{Dedup, Similarity}

    val scratch = s"${graft.queries.Queries.scratchRoot}/q85-index-" +
      dir.replaceAll("[^A-Za-z0-9.]", "_")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    if (!graft.io.Lake.exists(spark, s"$scratch/assignment"))
      Similarity.writeIndex(emb, scratch, nCells = 16)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time5(label: String)(work: => Unit): Unit = {
      work // warm
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q85probe] $label%-10s min ${ts.head}%6.3f s  median ${ts(2)}%6.3f  max ${ts.last}%6.3f")
    }

    val n = emb.count()
    val cells = spark.read.parquet(s"$scratch/assignment")
      .groupBy("cell").count().orderBy(desc("count")).collect()
    println(s"[q85probe] n=$n  cells=${cells.length}  " +
      s"sizes=${cells.map(_.getLong(1)).mkString(",")}")
    val nPairs = Similarity.cosinePairsBlockedFromIndex(spark, scratch, 0.4).count()
    println(s"[q85probe] pairs=$nPairs")

    time5("assign") { noop(spark.read.parquet(s"$scratch/assignment")) }
    time5("pairs") {
      noop(Similarity.cosinePairsBlockedFromIndex(spark, scratch, 0.4))
    }
    val pairsMat = Similarity.cosinePairsBlockedFromIndex(spark, scratch, 0.4)
      .select(col("ida").as("da"), col("idb").as("db")).localCheckpoint()
    time5("cc") { noop(Dedup.connectedComponents(pairsMat)) }
    time5("full") {
      noop(Similarity.semanticDedupSurvivorsFromIndex(spark, emb, "vec_id",
        scratch, threshold = 0.4)
        .groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
        .orderBy("label"))
    }
    spark.stop()
  }
}
