package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke, round 19 — the bucket-level-publish evidence row
  * (VERDICT r18 #1 "Done" criterion): under the lake posture (bucket
  * count ∝ corpus, so per-bucket volume stays constant), a FIXED small
  * batch appended/folded into a ×1/×10/×30 index must cost
  * O(touched buckets), i.e. STOP scaling with the corpus — where the
  * r18 publish (whole-table rewrite) was linear in the index by
  * construction. Each scale row records:
  *   - `append_s` / `fold_s`: the in-place bucket-level maintenance
  *     (appendToWeightedEdgeIndex / compactCoVisitIntoIndex) of the
  *     same fixed delta;
  *   - `full_rewrite_s`: the counterfactual O(index) publish (read the
  *     whole table, re-place, writeBucketed) — what every maintenance
  *     call paid before r19;
  *   - `touched`/`buckets`: the touched-bucket count against the total.
  *
  * Corpus synthesis reuses the r16–r18 perturbed replication (ids
  * offset by 1e8 per replica). Writes SCALE_SMOKE_r19.json.
  *
  * Usage: runMain graft.tools.ScaleSmokeR19 [baseDir] [workRoot]
  */
object ScaleSmokeR19 {

  private val off = 100000000L

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workRoot = if (args.length > 1) args(1) else "/tmp/graft-scale17"
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
    import spark.implicits._

    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def synthesizeLineitem(dir: String, f: Int): Unit = {
      new java.io.File(dir).mkdirs()
      if (!new java.io.File(s"$dir/lineitem.parquet").exists()) {
        val df = spark.read.parquet(s"$base/lineitem.parquet")
        val rep = Seq("l_orderkey", "l_suppkey", "l_partkey").foldLeft(
          df.withColumn("__r", explode(sequence(lit(0), lit(f - 1))))) {
          (d, c) => d.withColumn(c, col(c) + col("__r") * off)
        }
        val tmp = s"$dir/__tmp_lineitem"
        rep.drop("__r").coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(x => x.getName.startsWith("part-") &&
            x.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$dir/lineitem.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        new java.io.File(tmp).listFiles().foreach(_.delete())
        new java.io.File(tmp).delete()
        println(s"[scale19] lineitem x$f synthesized")
      }
    }

    def edgesOf(f: org.apache.spark.sql.DataFrame) = f
      .select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst"))
      .unionAll(f.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")))
      .withColumn("w", lit(1L))

    // the FIXED maintenance batch, identical at every scale: 20 edge
    // observations over 10 srcs/10 dsts of replica 0 — the production
    // framing (ingest rate does not scale with corpus size)
    val fixedDelta = (1L to 10L).flatMap(i =>
      Seq((i * 2 + 1, i * 2 + 200, 1L), (i * 2 + 201, i * 2 + 2, 1L)))
      .toDF("src", "dst", "w")
    val fixedCoVisit = (1L to 10L).flatMap(i =>
      Seq((i, i + 500, 2L), (i + 500, i, 2L)))
      .toDF("part", "rec", "cooc")

    def tableFileCount(tbl: String): Int = {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(loc).count(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    }

    val rows = Seq((1, 8), (10, 80), (30, 240)).map { case (f, buckets) =>
      val dir = if (f == 1) base else s"$workRoot-x$f"
      if (f != 1) synthesizeLineitem(dir, f)
      val li = graft.queries.Queries.table(spark, dir, "lineitem")

      // ---- weighted-edge append: fixed delta, in-place ---------------
      val wTbl = s"smoke19_wedge_x$f"
      val tBuild = t { graft.ops.Graph.writeWeightedEdgeIndex(edgesOf(li),
        "src", "dst", "w", wTbl, buckets) }
      var tApp = Double.MaxValue
      for (_ <- 1 to 3) tApp = math.min(tApp, t {
        graft.ops.Graph.appendToWeightedEdgeIndex(fixedDelta,
          "src", "dst", "w", wTbl, buckets)
      })
      val wTouched = fixedDelta.select(explode(array(
          graft.io.Lake.bucketIdColumn(col("src"), buckets),
          graft.io.Lake.bucketIdColumn(col("dst"), buckets))).as("b"))
        .distinct().count()
      // counterfactual: the r18 publish — whole-table re-place + rewrite
      val tFull = t { graft.io.Lake.writeBucketed(
        spark.table(wTbl).repartition(buckets, col("src")),
        wTbl + "_ctf", "src", buckets, Some("src")) }
      val wFiles = tableFileCount(wTbl)
      spark.sql(s"DROP TABLE IF EXISTS $wTbl")
      spark.sql(s"DROP TABLE IF EXISTS ${wTbl}_ctf")

      // ---- co-visit fold: fixed landed partial, in-place -------------
      val cTbl = s"smoke19_covisit_x$f"
      graft.ops.Recs.writeCoVisitIndex(li, "l_orderkey", "l_partkey",
        cTbl, buckets)
      val landPath = s"${graft.queries.Queries.scratchRoot}/smoke19-land-x$f"
      def land(): Unit = {
        val hp = new org.apache.hadoop.fs.Path(landPath)
        hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
        graft.streaming.StreamSink.landBatch(fixedCoVisit, landPath, 0L)
      }
      var tFold = Double.MaxValue
      for (_ <- 1 to 3) {
        land()
        tFold = math.min(tFold, t {
          graft.streaming.StreamSink.compactCoVisitIntoIndex(spark, cTbl,
            landPath, buckets)
        })
      }
      val cTouched = fixedCoVisit
        .select(graft.io.Lake.bucketIdColumn(col("part"), buckets).as("b"))
        .distinct().count()
      spark.sql(s"DROP TABLE IF EXISTS $cTbl")

      val line = f"""{"factor":$f,"buckets":$buckets,""" +
        f""""wedge_build_s":$tBuild%.2f,"wedge_append_s":$tApp%.2f,""" +
        f""""wedge_touched":$wTouched,"wedge_files":$wFiles,""" +
        f""""full_rewrite_s":$tFull%.2f,""" +
        f""""covisit_fold_s":$tFold%.2f,"covisit_touched":$cTouched}"""
      println(s"[scale19] $line")
      line
    }

    val out = s"""{"mode":"bucket_level_publish_r19","base":"$base",""" +
      """"protocol":"bucket count scales with corpus (8/80/240 at x1/x10/x30, constant per-bucket volume); the SAME fixed 20-edge delta / 20-row landed partial is appended/folded in-place at every scale; full_rewrite_s is the counterfactual O(index) publish every maintenance call paid before r19",""" +
      s""""rows":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALE_SMOKE_r19.json"),
      (out + "\n").getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
