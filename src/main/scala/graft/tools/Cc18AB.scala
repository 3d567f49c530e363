package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of connectedComponents' loop conf (r18): legacy
  * (session AQE + session shuffle partitions inside the propagation loop)
  * vs tuned (loop shuffles sized from round 0's AQE-coalesced output, AQE
  * off for the loop). Variants alternate rep-by-rep so host speed phases
  * cancel (the Pr18AB convention). Pair set = q85's durable-index cosine
  * pairs at sf0.1, pre-materialized so ONLY the clustering loop is timed.
  * Usage: runMain graft.tools.Cc18AB [--sf <dir>] */
object Cc18AB {
  def main(args: Array[String]): Unit = {
    val sfIdx = args.indexOf("--sf")
    if (sfIdx >= 0 && sfIdx + 1 >= args.length) {
      System.err.println("Cc18AB: --sf needs a directory")
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
    val pairsMat = Similarity.cosinePairsBlockedFromIndex(spark, scratch, 0.4)
      .select(col("ida").as("da"), col("idb").as("db")).localCheckpoint()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(tuned: Boolean): Double = {
      val t0 = System.nanoTime()
      noop(Dedup.connectedComponentsMode(pairsMat, "da", "db", 50, tuned))
      (System.nanoTime() - t0) / 1e9
    }
    // equality gate before timing: same labeling both ways
    val l = Dedup.connectedComponentsMode(pairsMat, "da", "db", 50, false)
    val t = Dedup.connectedComponentsMode(pairsMat, "da", "db", 50, true)
    require(l.exceptAll(t).isEmpty && t.exceptAll(l).isEmpty,
      "tuned CC labeling differs from legacy")
    println("[cc18ab] equality gate passed")

    run(false); run(true) // warm both
    val (as, bs) = (Array.fill(5)(0.0), Array.fill(5)(0.0))
    for (i <- 0 until 5) { as(i) = run(false); bs(i) = run(true) }
    println(f"[cc18ab] legacy min ${as.min}%6.3f s  reps ${as.map(x => f"$x%5.3f").mkString(" ")}")
    println(f"[cc18ab] tuned  min ${bs.min}%6.3f s  reps ${bs.map(x => f"$x%5.3f").mkString(" ")}")

    // ---- r19: SKEWED synthetic set (VERDICT r18 #6) ------------------
    // a hub-heavy graph: one hub with 300k spokes + 50 chains of 2000 —
    // the high-degree regime where the r18 AQE-off loop lost skew
    // protection. The tuned path must stay correct AND not lose to
    // legacy (its ≤32-partition AQE-off gate is exactly the regime where
    // AQE's 256 MB skew split could never fire anyway).
    import spark.implicits._
    val hub = spark.range(1, 300001).select(lit(0L).as("da"), (col("id") * 2 + 1000000L).as("db"))
    val chains = spark.range(0, 100000).select(
      (col("id") % 50 * 10000000L + col("id") / 50 + 1).as("da"),
      (col("id") % 50 * 10000000L + col("id") / 50 + 2).as("db"))
    val skewPairs = hub.unionAll(chains).localCheckpoint()
    val ls = Dedup.connectedComponentsMode(skewPairs, "da", "db", 50, false)
    val ts = Dedup.connectedComponentsMode(skewPairs, "da", "db", 50, true)
    require(ls.exceptAll(ts).isEmpty && ts.exceptAll(ls).isEmpty,
      "tuned CC labeling differs from legacy on the skewed set")
    println("[cc18ab] skew equality gate passed")
    def runSkew(tuned: Boolean): Double = {
      val t0 = System.nanoTime()
      noop(Dedup.connectedComponentsMode(skewPairs, "da", "db", 50, tuned))
      (System.nanoTime() - t0) / 1e9
    }
    runSkew(false); runSkew(true)
    val (ss, st) = (Array.fill(3)(0.0), Array.fill(3)(0.0))
    for (i <- 0 until 3) { ss(i) = runSkew(false); st(i) = runSkew(true) }
    println(f"[cc18ab] SKEW legacy min ${ss.min}%6.3f s  reps ${ss.map(x => f"$x%5.3f").mkString(" ")}")
    println(f"[cc18ab] SKEW tuned  min ${st.min}%6.3f s  reps ${st.map(x => f"$x%5.3f").mkString(" ")}")
    spark.stop()
  }
}
