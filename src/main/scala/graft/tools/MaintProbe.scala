package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (r17): stage decomposition of the two new index
  * maintainers — q209 (beam-graph append) and q210 (streaming
  * co-visitation) — so their bench rows carry measured floors per
  * stage, not guesses. Min-of-3 per stage, stages run in dependency
  * order within each rep (the WatchProbe convention). */
object MaintProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Queries.table
    import graft.ops.{Recs, Similarity}

    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def min3(name: String)(f: => Unit): Unit = {
      var m = Double.MaxValue
      for (_ <- 1 to 3) m = math.min(m, t(f))
      println(f"[maint] $name%-34s $m%7.3f s")
    }

    // ---- q209 stages -----------------------------------------------
    val emb = table(spark, dir, "embeddings")
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val arrivals = emb.filter(col("vec_id") % 5 === 0)
    val scratch = "/dev/shm/graft-scratch/maintprobe-q209"
    def wipe(): Unit = {
      val root = new org.apache.hadoop.fs.Path(scratch)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(root, true)
    }
    min3("q209 build(base)") {
      wipe()
      Similarity.writeBeamGraphIndex(base, scratch, "maint_beam",
        nCells = 16, nProbe = 2, m = 6)
    }
    // append needs a fresh base each rep: rebuild untimed, time append
    var m209a = Double.MaxValue
    for (_ <- 1 to 3) {
      wipe()
      Similarity.writeBeamGraphIndex(base, scratch, "maint_beam",
        nCells = 16, nProbe = 2, m = 6)
      m209a = math.min(m209a,
        t(Similarity.appendToBeamGraphIndex(arrivals, scratch, "maint_beam")))
    }
    println(f"[maint] q209 append(arrivals)            $m209a%7.3f s")
    min3("q209 serve(recall)") {
      Similarity.beamSearchRecallAtKFromIndex(spark, scratch, "maint_beam",
        col("vec_id") % 10 === 0, k = 5, nProbe = 2, beam = 8, hops = 2)
        .count()
    }
    spark.sql("DROP TABLE IF EXISTS maint_beam")

    // ---- q210 stages -----------------------------------------------
    val li = table(spark, dir, "lineitem")
    min3("q210 base mine+write") {
      Recs.writeCoVisitIndex(li.filter(col("l_orderkey") % 7 =!= 0),
        "l_orderkey", "l_partkey", "maint_covisit", buckets = 8)
    }
    min3("q210 staging (3 slices)") {
      graft.queries.Queries.stagedTableStreamSplitBy(spark, dir,
        "maintprobe-q210", "lineitem", "l_orderkey", nFiles = 3)
    }
    min3("q210 stream (3 batches + fold)") {
      val sroot = "/dev/shm/graft-scratch/maintprobe-q210-land"
      val p = new org.apache.hadoop.fs.Path(sroot)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      val stream = graft.queries.Queries.stagedTableStreamSplitBy(spark, dir,
        "maintprobe-q210", "lineitem", "l_orderkey", nFiles = 3)
        .filter(col("l_orderkey") % 7 === 0)
      val q = graft.streaming.StreamSink.toCoVisitPairs(stream,
        s"$sroot/landings", s"$sroot/ckpt", "l_orderkey", "l_partkey",
        compactEvery = 2)
      q.processAllAvailable(); q.stop()
    }
    min3("q210 serve (base+landings topk)") {
      graft.streaming.StreamSink.readCoVisitTopK(spark, "maint_covisit",
        "/dev/shm/graft-scratch/maintprobe-q210-land/landings", k = 5)
        .orderBy(col("part"), col("cooc").desc, col("rec")).count()
    }
    // r18 fold-into-index stages: time the fold itself (fresh landings
    // restored per rep — the fold retires them), then the post-fold
    // serve, which reads the bucketed index ALONE
    def copyDir(src: String, dst: String): Unit = {
      val conf = spark.sparkContext.hadoopConfiguration
      val sp = new org.apache.hadoop.fs.Path(src)
      val dp = new org.apache.hadoop.fs.Path(dst)
      val fs = sp.getFileSystem(conf)
      fs.delete(dp, true)
      org.apache.hadoop.fs.FileUtil.copy(fs, sp, fs, dp, false, conf)
    }
    val cvLand = "/dev/shm/graft-scratch/maintprobe-q210-land/landings"
    val cvBak = "/dev/shm/graft-scratch/maintprobe-q210-bak"
    copyDir(cvLand, cvBak)
    var m210f = Double.MaxValue
    for (_ <- 1 to 3) {
      copyDir(cvBak, cvLand)
      m210f = math.min(m210f, t(
        graft.streaming.StreamSink.compactCoVisitIntoIndex(spark,
          "maint_covisit", cvLand, buckets = 8,
          into = "maint_covisit_served")))
    }
    println(f"[maint] q210 fold into index              $m210f%7.3f s")
    min3("q210 serve post-fold (index only)") {
      graft.streaming.StreamSink.readCoVisitTopK(spark,
          "maint_covisit_served", cvLand, k = 5)
        .orderBy(col("part"), col("cooc").desc, col("rec")).count()
    }
    spark.sql("DROP TABLE IF EXISTS maint_covisit")
    spark.sql("DROP TABLE IF EXISTS maint_covisit_served")

    // ---- q211 stages (weighted-edge append) -------------------------
    def edgesOf(f: org.apache.spark.sql.DataFrame) = f
      .select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst"))
      .unionAll(f.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")))
      .withColumn("w", lit(1L))
    val baseE = edgesOf(li.filter(col("l_orderkey") % 7 =!= 0))
    val batchE = edgesOf(li.filter(col("l_orderkey") % 7 === 0))
    min3("q211 build(base 6/7 wedges)") {
      graft.ops.Graph.writeWeightedEdgeIndex(baseE, "src", "dst", "w",
        "maint_wedge", buckets = 8)
    }
    var m211a = Double.MaxValue
    for (_ <- 1 to 3) {
      graft.ops.Graph.writeWeightedEdgeIndex(baseE, "src", "dst", "w",
        "maint_wedge", buckets = 8)
      m211a = math.min(m211a, t(graft.ops.Graph.appendToWeightedEdgeIndex(
        batchE, "src", "dst", "w", "maint_wedge", buckets = 8)))
    }
    println(f"[maint] q211 append(1/7 batch)            $m211a%7.3f s")
    min3("q211 walk(5 iter + top100)") {
      graft.ops.Graph.weightedPageRankFromIndex(spark, "maint_wedge",
          iterations = 5)
        .orderBy(col("rank_units").desc, col("node")).limit(100).count()
    }
    spark.sql("DROP TABLE IF EXISTS maint_wedge")

    // ---- q214 stages (streaming weighted edges) ----------------------
    min3("q214 base build") {
      graft.ops.Graph.writeWeightedEdgeIndex(baseE, "src", "dst", "w",
        "maint_wedge14", buckets = 8)
    }
    min3("q214 staging (3 slices)") {
      graft.queries.Queries.stagedTableStreamSplitBy(spark, dir,
        "maintprobe-q214", "lineitem", "l_orderkey", nFiles = 3)
    }
    val w14root = "/dev/shm/graft-scratch/maintprobe-q214-land"
    min3("q214 stream (3 batches + fold)") {
      val p = new org.apache.hadoop.fs.Path(w14root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      val staged = graft.queries.Queries.stagedTableStreamSplitBy(spark, dir,
        "maintprobe-q214", "lineitem", "l_orderkey", nFiles = 3)
        .filter(col("l_orderkey") % 7 === 0)
      val edgeStream = staged
        .select((col("l_suppkey") * 2 + 1).as("src"),
          (col("l_partkey") * 2).as("dst"))
        .unionByName(staged.select((col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst")))
        .withColumn("w", lit(1L))
      val q = graft.streaming.StreamSink.toWeightedEdges(edgeStream,
        s"$w14root/landings", s"$w14root/ckpt", "src", "dst", "w",
        compactEvery = 2)
      q.processAllAvailable(); q.stop()
    }
    min3("q214 serve (walk over base+landings)") {
      graft.streaming.StreamSink.readWeightedPageRank(spark,
          "maint_wedge14", s"$w14root/landings", iterations = 5)
        .orderBy(col("rank_units").desc, col("node")).limit(100).count()
    }
    // r18 fold-into-index stages (the q210 convention on the graph
    // family): fold timed with fresh landings per rep, then the
    // post-fold serve = the durable-index walk alone
    val weBak = "/dev/shm/graft-scratch/maintprobe-q214-bak"
    copyDir(s"$w14root/landings", weBak)
    var m214f = Double.MaxValue
    for (_ <- 1 to 3) {
      copyDir(weBak, s"$w14root/landings")
      m214f = math.min(m214f, t(
        graft.streaming.StreamSink.compactWeightedEdgesIntoIndex(spark,
          "maint_wedge14", s"$w14root/landings", buckets = 8,
          into = "maint_wedge14_served")))
    }
    println(f"[maint] q214 fold into index              $m214f%7.3f s")
    min3("q214 serve post-fold (index walk)") {
      graft.streaming.StreamSink.readWeightedPageRank(spark,
          "maint_wedge14_served", s"$w14root/landings", iterations = 5)
        .orderBy(col("rank_units").desc, col("node")).limit(100).count()
    }
    spark.sql("DROP TABLE IF EXISTS maint_wedge14")
    spark.sql("DROP TABLE IF EXISTS maint_wedge14_served")
    spark.stop()
  }
}
