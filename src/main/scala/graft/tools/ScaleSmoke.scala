package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke (VERDICT r14 #1): execute the heavy operator families at a
  * synthesized ~10× corpus and record wall-time scaling, peak driver
  * heap, and the no-cartesian/no-NLJ plan invariant at the larger scale —
  * converting the "would survive 100×" design notes into a measured
  * artifact (`SCALE_SMOKE_r15.json`).
  *
  * Corpus synthesis: deterministic replication with id offsets —
  * documents/embeddings ×F on their id, lineitem/orders ×F on their key
  * columns (disjoint graph copies), remaining tables copied verbatim.
  * Replicated CONTENT is identical by design, so dedup/ANN pair outputs
  * grow ~F² (every original pair appears F² times across replica
  * combinations, plus F·C(F,2)-ish exact-copy pairs): for those families
  * the honest scaling check is work ∝ OUTPUT, and the artifact records
  * output rows alongside wall time so the super-linearity is measured
  * and attributed, not hidden.
  *
  * Usage: runMain graft.tools.ScaleSmoke [baseDir] [workDir] [factor]
  */
object ScaleSmoke {

  private val smokeList = Seq(
    "q20_dedup_minhash_lsh", "q22_dedup_ngram_jaccard", "q23_dedup_embedding",
    "q59_dedup_incremental", "q61_dedup_index_append",
    "q84_dedup_from_index", "q85_semantic_dedup",
    "q90_pagerank", "q105_pagerank_index", "q113_triangles",
    "q194_stream_bpe", "q195_bpe_iterative", "q196_bpe_tokenize",
    "q197_stream_ivf", "q198_kmeans", "q199_substring_dedup",
    "q201_unigram_lm", "q202_unigram_tokenize", "q203_unigram_ppl")

  /** (table, id columns to offset per replica) */
  private val replicated = Seq(
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "lineitem" -> Seq("l_orderkey", "l_suppkey", "l_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"))
  private val copied =
    Seq("region", "nation", "customer", "supplier", "part", "events")

  private class HeapPeak extends Thread {
    @volatile var peak = 0L
    @volatile private var stopFlag = false
    setDaemon(true)
    override def run(): Unit = {
      val mx = java.lang.management.ManagementFactory.getMemoryMXBean
      while (!stopFlag) {
        peak = math.max(peak, mx.getHeapMemoryUsage.getUsed)
        Thread.sleep(50)
      }
    }
    def halt(): Long = { stopFlag = true; peak }
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "/tmp/graft-scale10"
    val factor = if (args.length > 2) args(2).toInt else 10
    val off = 100000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.CatalystExpressions.register(spark)

    // --- synthesize the ×factor corpus ---------------------------------
    // Tables are emitted as SINGLE parquet FILES (write one part file,
    // move it into place) to match the testdata layout: the streaming
    // scaffold (Queries.stagedTableStream) stages tables with
    // Files.copy, which copies a Spark-style parquet DIRECTORY as an
    // empty dir — the first smoke run silently fed q194/q197 zero rows.
    val wdir = new java.io.File(work)
    def publishSingleFile(dfDir: String, target: String): Unit = {
      val d = new java.io.File(dfDir)
      val part = d.listFiles().find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(target),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      d.listFiles().foreach(_.delete()); d.delete()
    }
    if (!new java.io.File(wdir, "_done").exists()) {
      replicated.foreach { case (t, ids) =>
        val df = spark.read.parquet(s"$base/$t.parquet")
        val rep = ids.foldLeft(
          df.withColumn("__r", explode(sequence(lit(0), lit(factor - 1))))) {
          (d, c) => d.withColumn(c, col(c) + col("__r") * off)
        }.drop("__r")
        rep.coalesce(1).write.mode("overwrite").parquet(s"$work/__tmp_$t")
        publishSingleFile(s"$work/__tmp_$t", s"$work/$t.parquet")
        println(s"[scale] $t x$factor -> " +
          s"${spark.read.parquet(s"$work/$t.parquet").count()} rows")
      }
      copied.foreach { t =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$base/$t.parquet"),
          java.nio.file.Paths.get(s"$work/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      new java.io.FileOutputStream(new java.io.File(wdir, "_done")).close()
    }

    // --- run the smoke list at 1x and at Fx ----------------------------
    val qs = graft.queries.Queries.all
    val results = Seq.newBuilder[String]
    smokeList.foreach { name =>
      val fn = qs(name).fn
      def run(dir: String): (Double, Long, Long, Boolean) = {
        val tracker = new HeapPeak; tracker.start()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val n = df.count()
        val secs = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan.toString
        val clean = !plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoopJoin")
        (secs, n, tracker.halt(), clean)
      }
      val (t1, n1, _, _) = run(base)
      val (tF, nF, peakF, cleanF) = run(work)
      val line = f"""{"q":"$name","t1_s":$t1%.2f,"t${factor}_s":$tF%.2f,""" +
        f""""ratio":${tF / math.max(t1, 1e-9)}%.2f,"rows1":$n1,""" +
        f""""rows$factor":$nF,"row_ratio":${nF.toDouble / math.max(n1, 1)}%.1f,""" +
        f""""peak_heap_mb":${peakF / 1048576},"plan_clean":$cleanF}"""
      println(s"[scale] $line")
      results += line
    }
    val out = s"""{"factor":$factor,"base":"$base","work":"$work",""" +
      s""""queries":[${results.result().mkString(",")}]}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALE_SMOKE_r15.json"),
      (out + "\n").getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
