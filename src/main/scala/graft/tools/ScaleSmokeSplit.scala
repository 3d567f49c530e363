package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke, round 17 (VERDICT r16 #6): BUILD-vs-SERVE split for the
  * first-touch-index families — the r16 smoke measured q204/q200 at ~4×
  * wall at ×10 data INCLUDING their first-touch index builds, which
  * conflates the prepaid ingest-time cost with the per-query serve
  * asymptote. This smoke runs each declared query TWICE per scale: the
  * first call pays the index build (the q84/q85 build-vs-serve
  * precedent), the second is the steady-state serve — and pushes the
  * lineitem-derived graph/covisit families to ×30.
  *
  * Corpus synthesis is SCALE_SMOKE_r16's perturbed replication
  * (ScaleSmoke.scala): lineitem ids offset per replica (graph/basket
  * families scale linearly by construction), embeddings get the
  * orthogonal rotate + hash-parity sign flips so cross-replica cosines
  * scramble and ANN work scales in corpus, not output.
  *
  * Covered: q105 (PageRank serve), q200 (personalized — shares q105's
  * table, so its "first" call is already a serve), q204 (weighted),
  * q207 (co-visitation serve), q208 (beam-graph serve; its ONE intended
  * NLJ — the brute-force recall ground truth — is allowed by the q206
  * plan convention). Writes SCALE_SMOKE_r17.json.
  *
  * Usage: runMain graft.tools.ScaleSmokeSplit [baseDir] [workRoot]
  *          [factor] [pushFactor (0 = off)]
  */
object ScaleSmokeSplit {

  private val splitList = Seq("q105_pagerank_index",
    "q200_personalized_pagerank", "q204_weighted_pagerank",
    "q207_covisit_serve", "q208_beam_serve",
    // the maintainers re-run their full maintenance cycle on BOTH
    // calls (q209/q211 rebuild+append per run by declaration;
    // q210/q214 restage+restream, only their base index is
    // first-touch), so for them first≈serve and the serve_ratio IS the
    // maintenance-cycle wall ratio at scale
    "q209_beam_append", "q210_stream_covisit_index",
    "q211_weighted_edge_append", "q214_stream_wedge_index",
    // serve-shape additions (r17 session 2): q212 first-touch builds
    // the IVF index then serves the band top-k; q213/q215 are
    // in-session (window prefix-sum / ADC shortlist + re-rank)
    "q212_hard_negatives", "q213_budget_select", "q215_pq_rerank")
  private val pushList = Seq("q105_pagerank_index",
    "q204_weighted_pagerank", "q207_covisit_serve")
  private val intendedNlj = Set("q208_beam_serve", "q209_beam_append")

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

  /** Orthogonal per-replica transform (ScaleSmoke.rotateFlip). */
  private def rotateFlip(emb: Column, r: Column): Column = {
    val d = size(emb)
    val sh = pmod(r * 7, d)
    val rotated = concat(slice(emb, sh + lit(1), d - sh), slice(emb, lit(1), sh))
    val flipped = transform(rotated, (x, i) =>
      x * when(pmod(hash(i, r, lit(24214)), lit(2)) === 0, lit(-1.0f))
        .otherwise(lit(1.0f)))
    when(r === 0, emb).otherwise(flipped)
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workRoot = if (args.length > 1) args(1) else "/tmp/graft-scale17"
    val factor = if (args.length > 2) args(2).toInt else 10
    val pushFactor = if (args.length > 3) args(3).toInt else 30
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

    def publishSingleFile(dfDir: String, target: String): Unit = {
      val d = new java.io.File(dfDir)
      val part = d.listFiles().find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(target),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      d.listFiles().foreach(_.delete()); d.delete()
    }

    /** Replicate only the tables the split families read. */
    def synthesize(dir: String, f: Int, tables: Seq[(String, Seq[String])]): Unit = {
      val wdir = new java.io.File(dir)
      if (new java.io.File(wdir, "_done").exists()) return
      wdir.mkdirs()
      tables.foreach { case (t, ids) =>
        val df = spark.read.parquet(s"$base/$t.parquet")
        var rep = ids.foldLeft(
          df.withColumn("__r", explode(sequence(lit(0), lit(f - 1))))) {
          (d, c) => d.withColumn(c, col(c) + col("__r") * off)
        }
        if (t == "embeddings")
          rep = rep.withColumn("embedding",
            rotateFlip(col("embedding"), col("__r")))
        rep.drop("__r").coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/__tmp_$t")
        publishSingleFile(s"$dir/__tmp_$t", s"$dir/$t.parquet")
        println(s"[scale] $t x$f -> " +
          s"${spark.read.parquet(s"$dir/$t.parquet").count()} rows")
      }
      new java.io.FileOutputStream(new java.io.File(wdir, "_done")).close()
    }

    val qs = graft.queries.Queries.all

    /** One (first-touch, steady-serve) measurement pair at `dir`. */
    def pair(name: String, dir: String): (Double, Double, Long, Long, Boolean) = {
      val fn = qs(name).fn
      def run(): (Double, Long, Long, Boolean) = {
        val tracker = new HeapPeak; tracker.start()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val n = df.count()
        val secs = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan.toString
        val nlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
        val clean = !plan.contains("CartesianProduct") &&
          nlj <= (if (intendedNlj(name)) 1 else 0)
        (secs, n, tracker.halt(), clean)
      }
      val (tFirst, _, _, _) = run()
      val (tServe, n, peak, clean) = run()
      (tFirst, tServe, n, peak, clean)
    }

    def rows(names: Seq[String], dir: String, f: Int): Seq[String] =
      names.map { name =>
        val (f1, s1, n1, _, _) = pair(name, base)
        val (fF, sF, nF, peakF, cleanF) = pair(name, dir)
        val line = f"""{"q":"$name","first_t1":$f1%.2f,"serve_t1":$s1%.2f,""" +
          f""""first_t$f":$fF%.2f,"serve_t$f":$sF%.2f,""" +
          f""""serve_ratio":${sF / math.max(s1, 1e-9)}%.2f,""" +
          f""""build_ratio":${(fF - sF) / math.max(f1 - s1, 1e-9)}%.2f,""" +
          f""""rows1":$n1,"rows$f":$nF,""" +
          f""""peak_heap_mb":${peakF / 1048576},"plan_clean":$cleanF}"""
        println(s"[scale] $line")
        line
      }

    val work = s"$workRoot-x$factor"
    synthesize(work, factor, Seq(
      "lineitem" -> Seq("l_orderkey", "l_suppkey", "l_partkey"),
      "embeddings" -> Seq("vec_id"),
      // q213 reads documents; ids offset, text carried as-is — sources
      // repeat so each group gets f× rows while the budget keeps the
      // OUTPUT fixed (≤ budget tokens per source): the smoke measures
      // linear scan work against deliberately sub-linear output
      "documents" -> Seq("doc_id")))
    val main = rows(splitList, work, factor)

    val pushJson =
      if (pushFactor <= 0) ""
      else {
        val pdir = s"$workRoot-x$pushFactor"
        synthesize(pdir, pushFactor, Seq(
          "lineitem" -> Seq("l_orderkey", "l_suppkey", "l_partkey")))
        val pres = rows(pushList, pdir, pushFactor)
        s""","push":{"factor":$pushFactor,"queries":[${pres.mkString(",")}]}"""
      }

    val out = s"""{"factor":$factor,"perturbed":true,"base":"$base",""" +
      s""""work":"$work","mode":"build_vs_serve_split",""" +
      s""""note":"first call pays the first-touch index build, second is the steady-state serve; q20-q205 standard rows carried from SCALE_SMOKE_r16; q200 shares q105's table so both its calls serve",""" +
      s""""queries":[${main.mkString(",")}]$pushJson}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALE_SMOKE_r17.json"),
      (out + "\n").getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
