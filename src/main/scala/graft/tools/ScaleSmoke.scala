package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke (VERDICT r14 #1, perturbed per VERDICT r15 #1): execute
  * the heavy operator families at a synthesized ~F× corpus and record
  * wall-time scaling, output rows, peak driver heap, and the
  * no-cartesian/no-NLJ plan invariant at the larger scale — converting
  * the "would survive 100×" design notes into a measured artifact
  * (`SCALE_SMOKE_r16.json`).
  *
  * Corpus synthesis — PERTURBED replication (the r15 artifact's
  * identical replicas made every near-dup family's output grow ~F²,
  * so those rows measured output-bound, not work-bound, scaling):
  *
  *  - documents ×F: replica 0 is verbatim; replica r > 0 salts EVERY
  *    token with `<r>` — a BIJECTIVE token rename, so all
  *    within-replica similarity structure (shingle sets, winnowing
  *    grams, Jaccard relations, word frames) is preserved exactly
  *    while cross-replica token overlap is ZERO. Near-dup / substring
  *    output therefore grows LINEARLY (each replica contributes one
  *    copy of the original pair set) and wall-clock ratios measure
  *    WORK, not output. Tokenizer-learning frames (q195/q201) grow ×F
  *    distinct words — also the honest work axis.
  *  - embeddings ×F: replica 0 verbatim; replica r > 0 applies an
  *    ORTHOGONAL transform — cyclic rotation by 7r positions composed
  *    with deterministic hash-parity sign flips. Within-replica norms
  *    and inner products are preserved exactly (±1 multiplies and
  *    permutations are float-exact), cross-replica cosines scramble to
  *    ~0, so ANN pair output stays linear too.
  *  - lineitem/orders ×F: id-offset disjoint copies (graph families
  *    scale linearly by construction); remaining tables verbatim.
  *
  * A `push` mode re-runs the flagship near-dup families (q20 docs,
  * q23 embeddings) at ×30 to probe the driver/shuffle knees a ×10 run
  * cannot see.
  *
  * Usage: runMain graft.tools.ScaleSmoke [baseDir] [workDir] [factor]
  *          [identical|perturbed] [pushFactor (0 = off)]
  */
object ScaleSmoke {

  private val smokeList = Seq(
    "q20_dedup_minhash_lsh", "q22_dedup_ngram_jaccard", "q23_dedup_embedding",
    "q59_dedup_incremental", "q61_dedup_index_append",
    "q84_dedup_from_index", "q85_semantic_dedup",
    "q90_pagerank", "q105_pagerank_index", "q113_triangles",
    "q194_stream_bpe", "q195_bpe_iterative", "q196_bpe_tokenize",
    "q197_stream_ivf", "q198_kmeans", "q199_substring_dedup",
    "q200_personalized_pagerank", "q201_unigram_lm",
    "q202_unigram_tokenize", "q203_unigram_ppl",
    "q204_weighted_pagerank", "q205_stream_cdc")

  private val pushList = Seq("q20_dedup_minhash_lsh", "q23_dedup_embedding")

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

  /** Bijective per-replica token rename: zero cross-replica overlap,
    * exact within-replica structure. Replica 0 stays verbatim so the
    * original corpus is a strict subset. */
  private def saltText(text: Column, r: Column): Column =
    when(r === 0, text).otherwise(
      array_join(transform(split(text, " "),
        t => when(t === "", t)
          .otherwise(concat(t, lit("\u0001"), r.cast("string")))), " "))

  /** Orthogonal per-replica transform: rotate by 7r positions, then
    * hash-parity sign flips — norms and within-replica inner products
    * exact, cross-replica cosines scrambled. Replica 0 verbatim. */
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
    val work = if (args.length > 1) args(1) else "/tmp/graft-scale10"
    val factor = if (args.length > 2) args(2).toInt else 10
    val perturbed = if (args.length > 3) args(3) != "identical" else true
    val pushFactor = if (args.length > 4) args(4).toInt else 30
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

    // --- synthesize a ×F corpus -----------------------------------------
    // Tables are emitted as SINGLE parquet FILES (write one part file,
    // move it into place) to match the testdata layout: the streaming
    // scaffold (Queries.stagedTableStream) stages tables with
    // Files.copy, which copies a Spark-style parquet DIRECTORY as an
    // empty dir — the first r15 smoke run silently fed q194/q197 zero
    // rows. Rows are recorded per scale to catch that class.
    def publishSingleFile(dfDir: String, target: String): Unit = {
      val d = new java.io.File(dfDir)
      val part = d.listFiles().find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(target),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      d.listFiles().foreach(_.delete()); d.delete()
    }
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
        if (perturbed && t == "documents")
          rep = rep.withColumn("text", saltText(col("text"), col("__r")))
        if (perturbed && t == "embeddings")
          rep = rep.withColumn("embedding",
            rotateFlip(col("embedding"), col("__r")))
        rep.drop("__r").coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/__tmp_$t")
        publishSingleFile(s"$dir/__tmp_$t", s"$dir/$t.parquet")
        println(s"[scale] $t x$f -> " +
          s"${spark.read.parquet(s"$dir/$t.parquet").count()} rows")
      }
      copied.foreach { t =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$base/$t.parquet"),
          java.nio.file.Paths.get(s"$dir/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      new java.io.FileOutputStream(new java.io.File(wdir, "_done")).close()
    }
    synthesize(work, factor, replicated)

    // --- run a smoke list at 1x and at Fx -------------------------------
    val qs = graft.queries.Queries.all
    def smoke(names: Seq[String], dir: String, f: Int): Seq[String] = {
      names.map { name =>
        val fn = qs(name).fn
        def run(d: String): (Double, Long, Long, Boolean) = {
          val tracker = new HeapPeak; tracker.start()
          val t0 = System.nanoTime()
          val df = fn(spark, d)
          val n = df.count()
          val secs = (System.nanoTime() - t0) / 1e9
          val plan = df.queryExecution.executedPlan.toString
          val clean = !plan.contains("CartesianProduct") &&
            !plan.contains("BroadcastNestedLoopJoin")
          (secs, n, tracker.halt(), clean)
        }
        val (t1, n1, _, _) = run(base)
        val (tF, nF, peakF, cleanF) = run(dir)
        val line = f"""{"q":"$name","t1_s":$t1%.2f,"t${f}_s":$tF%.2f,""" +
          f""""ratio":${tF / math.max(t1, 1e-9)}%.2f,"rows1":$n1,""" +
          f""""rows$f":$nF,"row_ratio":${nF.toDouble / math.max(n1, 1)}%.1f,""" +
          f""""peak_heap_mb":${peakF / 1048576},"plan_clean":$cleanF}"""
        println(s"[scale] $line")
        line
      }
    }
    val results = smoke(smokeList, work, factor)

    // --- ×pushFactor probe for the flagship near-dup families -----------
    val pushJson =
      if (pushFactor <= 0) ""
      else {
        val pdir = s"$work-push$pushFactor"
        synthesize(pdir, pushFactor,
          replicated.filter(t => Seq("documents", "embeddings").contains(t._1)))
        val pres = smoke(pushList, pdir, pushFactor)
        s""","push":{"factor":$pushFactor,"queries":[${pres.mkString(",")}]}"""
      }

    val out = s"""{"factor":$factor,"perturbed":$perturbed,"base":"$base",""" +
      s""""work":"$work","queries":[${results.mkString(",")}]$pushJson}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALE_SMOKE_r16.json"),
      (out + "\n").getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
