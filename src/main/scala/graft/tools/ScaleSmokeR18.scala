package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke, round 18 — closes the two r17 measurement defects:
  *
  *  1. **Cold-fair ×1 protocol (VERDICT r17 #5).** The r17 push section
  *     re-measured its ×1 baselines AFTER the main ×10 section had
  *     already built every first-touch index in-session, so its ×1
  *     "first" walls were warm (q207 0.34 s vs 3.63 s) and the push
  *     build ratios were denominator artifacts. Here every ×1 pair is
  *     measured ONCE, cold, at session start, and BOTH the ×10 and ×30
  *     sections reuse those numbers — one protocol, one baseline.
  *
  *  2. **Measured √n `autoCells` posture (VERDICT r17 #2).** The r17
  *     smoke ran q215/q209 only under their DECLARED fixed-16-cell
  *     configs, where per-cell population grows linearly with corpus
  *     (quadratic total work: q215 22×, q209 17.5× at ×10); the claim
  *     that the production `nCells = 0` → √n sizing keeps the work
  *     linear was asserted, never measured. The `auto` rows measure
  *     exactly that: a PQ index built with `nCells = 0` serving a FIXED
  *     200-query set via the partition-pruned ADC scan (per-query
  *     candidates ∝ 2√n), and a beam-graph index built with
  *     `nCells = 0` absorbing a FIXED arrival batch (repair volume ∝
  *     n · newPerCell, newPerCell = |batch|/√n). Fixed query/batch
  *     sizes are the production framing — serve and ingest rates do not
  *     scale with corpus size; the declared rows (queries ∝ corpus)
  *     stay in the main section for continuity.
  *
  * Corpus synthesis is the r16/r17 perturbed replication (ids offset by
  * 1e8 per replica; embeddings rotate+sign-flip so cross-replica
  * cosines scramble). Writes SCALE_SMOKE_r18.json.
  *
  * Usage: runMain graft.tools.ScaleSmokeR18 [baseDir] [workRoot]
  *          [factor] [pushFactor (0 = off)]
  */
object ScaleSmokeR18 {

  private val splitList = Seq("q105_pagerank_index",
    "q200_personalized_pagerank", "q204_weighted_pagerank",
    "q207_covisit_serve", "q208_beam_serve",
    "q209_beam_append", "q210_stream_covisit_index",
    "q211_weighted_edge_append", "q214_stream_wedge_index",
    "q212_hard_negatives", "q213_budget_select", "q215_pq_rerank")
  private val pushList = Seq("q105_pagerank_index",
    "q204_weighted_pagerank", "q207_covisit_serve")
  private val intendedNlj = Set("q208_beam_serve", "q209_beam_append")

  private val off = 100000000L

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
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.queries.Queries.scratchRoot + "/warehouse")
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

    /** Replicate any tables not already present in `dir` (the r17 smoke
      * may have left a partial dir — e.g. ×30 with lineitem only). */
    def synthesize(dir: String, f: Int, tables: Seq[(String, Seq[String])]): Unit = {
      new java.io.File(dir).mkdirs()
      tables.foreach { case (t, ids) =>
        if (!new java.io.File(s"$dir/$t.parquet").exists()) {
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
      }
    }

    val qs = graft.queries.Queries.all

    /** One (first-touch, steady-serve) measurement pair at `dir`. */
    def pair(name: String, dir: String): (Double, Double, Long, Long, Boolean) = {
      val fn = qs(name).fn
      def run(): (Double, Long, Long, Boolean) = {
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val n = df.count()
        val secs = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan.toString
        val nlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
        val clean = !plan.contains("CartesianProduct") &&
          nlj <= (if (intendedNlj(name)) 1 else 0)
        val peak = java.lang.management.ManagementFactory.getMemoryMXBean
          .getHeapMemoryUsage.getUsed
        (secs, n, peak, clean)
      }
      val (tFirst, _, _, _) = run()
      val (tServe, n, peak, clean) = run()
      (tFirst, tServe, n, peak, clean)
    }

    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def wipe(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    }

    // ---- SECTION 1: cold ×1 baselines, measured once, reused everywhere
    println("[scale] cold x1 baselines")
    val base1 = scala.collection.mutable.LinkedHashMap[String, (Double, Double, Long)]()
    splitList.foreach { name =>
      val (f1, s1, n1, _, _) = pair(name, base)
      base1(name) = (f1, s1, n1)
      println(f"[scale] x1 $name first=$f1%.2f serve=$s1%.2f rows=$n1")
    }

    // ---- autoCells measurement (the √n posture, VERDICT r17 #2) ------
    import graft.ops.Similarity
    /** PQ ADC serve under nCells=0: build untimed (prepaid ingest), then
      * the partition-pruned ADC scan for the FIXED replica-0 query set. */
    def autoPq(dir: String, tag: String): (Double, Double) = {
      val emb = graft.queries.Queries.table(spark, dir, "embeddings")
      val scratch = s"/dev/shm/graft-scratch/smoke18-pq-$tag"
      wipe(scratch)
      Similarity.clearIndexCaches()
      val tBuild = t { Similarity.writePqIndex(emb, scratch, nCells = 0,
        m = 8, ks = 16) }
      val queries = emb.filter(col("vec_id") % 10 === 0 &&
        col("vec_id") < off)
      var tServe = Double.MaxValue
      for (_ <- 1 to 3) tServe = math.min(tServe, t {
        Similarity.ivfPqTopKFromIndexFor(spark, scratch, queries,
          k = 5, nProbe = 2).count()
      })
      (tBuild, tServe)
    }
    /** Beam-graph append under nCells=0: base (everything but replica-0's
      * %5==0 slice) built untimed, the FIXED arrival batch appended
      * timed — fresh base per rep (append mutates it). */
    def autoBeam(dir: String, tag: String): (Double, Double) = {
      val emb = graft.queries.Queries.table(spark, dir, "embeddings")
      val arrivals = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") < off)
      val baseE = emb.exceptAll(arrivals)
      val scratch = s"/dev/shm/graft-scratch/smoke18-beam-$tag"
      val tbl = s"smoke18_beam_$tag"
      var tBuild = 0.0
      var tApp = Double.MaxValue
      for (_ <- 1 to 2) {
        wipe(scratch)
        Similarity.clearIndexCaches()
        tBuild = t { Similarity.writeBeamGraphIndex(baseE, scratch, tbl,
          nCells = 0, nProbe = 2, m = 6) }
        tApp = math.min(tApp,
          t { Similarity.appendToBeamGraphIndex(arrivals, scratch, tbl) })
      }
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      (tBuild, tApp)
    }

    val (pqB1, pqS1) = autoPq(base, "x1")
    val (bmB1, bmA1) = autoBeam(base, "x1")
    println(f"[scale] auto x1: pq build=$pqB1%.2f adc=$pqS1%.2f " +
      f"beam build=$bmB1%.2f append=$bmA1%.2f")

    // ---- SECTION 2: ×factor main rows --------------------------------
    val work = s"$workRoot-x$factor"
    synthesize(work, factor, Seq(
      "lineitem" -> Seq("l_orderkey", "l_suppkey", "l_partkey"),
      "embeddings" -> Seq("vec_id"),
      "documents" -> Seq("doc_id")))
    val main = splitList.map { name =>
      val (f1, s1, n1) = base1(name)
      val (fF, sF, nF, peakF, cleanF) = pair(name, work)
      val line = f"""{"q":"$name","first_t1":$f1%.2f,"serve_t1":$s1%.2f,""" +
        f""""first_t$factor":$fF%.2f,"serve_t$factor":$sF%.2f,""" +
        f""""serve_ratio":${sF / math.max(s1, 1e-9)}%.2f,""" +
        f""""build_ratio":${(fF - sF) / math.max(f1 - s1, 1e-9)}%.2f,""" +
        f""""rows1":$n1,"rows$factor":$nF,""" +
        f""""peak_heap_mb":${peakF / 1048576},"plan_clean":$cleanF}"""
      println(s"[scale] $line")
      line
    }
    val (pqBF, pqSF) = autoPq(work, s"x$factor")
    val (bmBF, bmAF) = autoBeam(work, s"x$factor")
    println(f"[scale] auto x$factor: pq build=$pqBF%.2f adc=$pqSF%.2f " +
      f"beam build=$bmBF%.2f append=$bmAF%.2f")

    // ---- SECTION 3: ×pushFactor push rows (cold-fair ×1 reused) ------
    val pushJson =
      if (pushFactor <= 0) ""
      else {
        val pdir = s"$workRoot-x$pushFactor"
        synthesize(pdir, pushFactor, Seq(
          "lineitem" -> Seq("l_orderkey", "l_suppkey", "l_partkey"),
          "embeddings" -> Seq("vec_id")))
        val pres = pushList.map { name =>
          val (f1, s1, n1) = base1(name)
          val (fF, sF, nF, peakF, cleanF) = pair(name, pdir)
          val line = f"""{"q":"$name","first_t1":$f1%.2f,"serve_t1":$s1%.2f,""" +
            f""""first_t$pushFactor":$fF%.2f,"serve_t$pushFactor":$sF%.2f,""" +
            f""""serve_ratio":${sF / math.max(s1, 1e-9)}%.2f,""" +
            f""""build_ratio":${(fF - sF) / math.max(f1 - s1, 1e-9)}%.2f,""" +
            f""""rows1":$n1,"rows$pushFactor":$nF,""" +
            f""""peak_heap_mb":${peakF / 1048576},"plan_clean":$cleanF}"""
          println(s"[scale] $line")
          line
        }
        val (pqBP, pqSP) = autoPq(pdir, s"x$pushFactor")
        val (bmBP, bmAP) = autoBeam(pdir, s"x$pushFactor")
        println(f"[scale] auto x$pushFactor: pq build=$pqBP%.2f adc=$pqSP%.2f " +
          f"beam build=$bmBP%.2f append=$bmAP%.2f")
        f""","push":{"factor":$pushFactor,"queries":[${pres.mkString(",")}],""" +
          f""""auto":[{"q":"q215_adc_autocells","build_t$pushFactor":$pqBP%.2f,""" +
          f""""serve_t$pushFactor":$pqSP%.2f,"serve_ratio":${pqSP / math.max(pqS1, 1e-9)}%.2f},""" +
          f"""{"q":"q209_append_autocells","build_t$pushFactor":$bmBP%.2f,""" +
          f""""append_t$pushFactor":$bmAP%.2f,"append_ratio":${bmAP / math.max(bmA1, 1e-9)}%.2f}]}"""
      }

    val autoJson =
      f""","auto":[{"q":"q215_adc_autocells","build_t1":$pqB1%.2f,"serve_t1":$pqS1%.2f,""" +
        f""""build_t$factor":$pqBF%.2f,"serve_t$factor":$pqSF%.2f,""" +
        f""""serve_ratio":${pqSF / math.max(pqS1, 1e-9)}%.2f,""" +
        """"note":"nCells=0 (sqrt-n) PQ index, FIXED 200-query replica-0 set, partition-pruned ADC scan; per-query candidates ~ 2*sqrt(n)"},""" +
      f"""{"q":"q209_append_autocells","build_t1":$bmB1%.2f,"append_t1":$bmA1%.2f,""" +
        f""""build_t$factor":$bmBF%.2f,"append_t$factor":$bmAF%.2f,""" +
        f""""append_ratio":${bmAF / math.max(bmA1, 1e-9)}%.2f,""" +
        """"note":"nCells=0 (sqrt-n) beam-graph index, FIXED replica-0 arrival batch appended; repair volume ~ n * |batch|/sqrt(n)"}]"""

    val out = s"""{"factor":$factor,"perturbed":true,"base":"$base",""" +
      s""""work":"$work","mode":"build_vs_serve_split_r18",""" +
      s""""protocol":"every x1 pair measured ONCE, cold, at session start; the x$factor and x$pushFactor sections reuse those baselines (VERDICT r17 #5 - no warm-denominator build ratios)",""" +
      s""""queries":[${main.mkString(",")}]$autoJson$pushJson}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALE_SMOKE_r18.json"),
      (out + "\n").getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
