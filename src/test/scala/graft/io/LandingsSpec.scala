package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.streaming.StreamSink

/** The landing `OPTIMIZE` (VERDICT r14 #3): folding `batch=<id>`
  * partitions into one `compact=<g>` generation must leave every
  * serve path's result invariant, under replays and at every crash
  * point of the fold itself. */
class LandingsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def dirNames(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (!f.exists()) Nil
    else f.listFiles().filter(_.isDirectory).map(_.getName).toSeq.sorted
  }

  private def served(path: String): Seq[(String, Long)] =
    Landings.readLandings(spark, path)
      .map(_.select($"k", $"n").as[(String, Long)].collect().sorted.toSeq)
      .getOrElse(Nil)

  test("compactLandings folds everything into one generation; serve set invariant; GC complete") {
    val path = Files.createTempDirectory("graft-land").toString + "/l"
    (0L to 3L).foreach { i =>
      StreamSink.landBatch(
        Seq((s"k$i", i + 10)).toDF("k", "n"), path, i)
    }
    val before = served(path)
    assert(before.size == 4)
    assert(Landings.compactLandings(spark, path))
    assert(served(path) == before, "fold must not change the serve set")
    // one committed generation, zero batch dirs, manifest covers 0..3
    assert(dirNames(path) == Seq("compact=3"))
    val mf = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/compact=3/_covered.txt")), "UTF-8")
    assert(mf.split("\\s+").filter(_.nonEmpty).toSeq == Seq("0", "1", "2", "3"))
    // nothing new to fold: second call is a no-op
    assert(!Landings.compactLandings(spark, path))
  }

  test("a batch replayed AFTER the fold is covered by the manifest, never double-counted") {
    val path = Files.createTempDirectory("graft-land-rp").toString + "/l"
    (0L to 2L).foreach { i =>
      StreamSink.landBatch(Seq((s"k$i", i)).toDF("k", "n"), path, i)
    }
    val before = served(path)
    assert(Landings.compactLandings(spark, path))
    // crash-recovery replay of batch 1 re-lands it (even with different
    // rows — the landing protocol says its content is already committed)
    StreamSink.landBatch(Seq(("ghost", 999L)).toDF("k", "n"), path, 1L)
    assert(served(path) == before,
      "covered batch dirs must be ignored by readers")
    // and the NEXT fold garbage-collects the stale replay without folding it
    StreamSink.landBatch(Seq(("k9", 9L)).toDF("k", "n"), path, 9L)
    assert(Landings.compactLandings(spark, path))
    assert(served(path) == (before :+ ("k9", 9L)).sorted)
    assert(dirNames(path) == Seq("compact=9"))
  }

  test("second fold covers the prior generation plus new batches, gen number strictly grows") {
    val path = Files.createTempDirectory("graft-land-2g").toString + "/l"
    (0L to 1L).foreach { i =>
      StreamSink.landBatch(Seq((s"a$i", i)).toDF("k", "n"), path, i)
    }
    assert(Landings.compactLandings(spark, path))
    (2L to 3L).foreach { i =>
      StreamSink.landBatch(Seq((s"b$i", i)).toDF("k", "n"), path, i)
    }
    val before = served(path)
    assert(before.size == 4)
    assert(Landings.compactLandings(spark, path))
    assert(served(path) == before)
    assert(dirNames(path) == Seq("compact=3"))
  }

  test("crash shapes never break or skew the read: staging-only, empty batch dir, leftover old gen") {
    val root = Files.createTempDirectory("graft-land-cr").toString
    val path = s"$root/l"
    // a crashed landBatch leaves only a dot-staging dir: not servable
    new java.io.File(s"$path/.staging-batch-0").mkdirs()
    assert(Landings.readLandings(spark, path).isEmpty)
    // an all-filtered micro-batch landed an EMPTY batch partition
    // (ADVICE r14): ignored, not a schema-inference crash
    new java.io.File(s"$path/batch=5").mkdirs()
    assert(Landings.readLandings(spark, path).isEmpty)
    // one real landing serves alone next to both artifacts
    StreamSink.landBatch(Seq(("k", 1L)).toDF("k", "n"), path, 6L)
    assert(served(path) == Seq(("k", 1L)))
    // interrupted-cleanup shape: an OLD generation dir left behind next
    // to a newer one — only the newest generation is consulted
    StreamSink.landBatch(Seq(("k2", 2L)).toDF("k", "n"), path, 7L)
    assert(Landings.compactLandings(spark, path))
    val after = served(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // resurrect a stale older generation claiming different content
    StreamSink.landBatch(Seq(("stale", 99L)).toDF("k", "n"), s"$root/fake", 0L)
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/fake/batch=0"),
      new org.apache.hadoop.fs.Path(s"$path/compact=2"))
    val mf = fs.create(
      new org.apache.hadoop.fs.Path(s"$path/compact=2/_covered.txt"), true)
    mf.write("0\n".getBytes("UTF-8")); mf.close()
    assert(served(path) == after, "stale lower generation must be shadowed")
  }

  test("compactIvfLandings: cell partitioning preserved, served pair set fold-invariant") {
    import graft.ops.Similarity
    val root = Files.createTempDirectory("graft-land-ivf").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    Similarity.writeIndex(emb.filter(col("vec_id") % 3 === 0),
      s"$root/base", nCells = 8)
    Seq(1, 2).foreach { m =>
      StreamSink.landBatch(Similarity.assignmentForIndex(
        emb.filter(col("vec_id") % 3 === m), s"$root/base"),
        s"$root/landings", m.toLong, partitionCols = Seq("cell"))
    }
    val before = Similarity.cosinePairsBlockedFromIndexWithLandings(
      spark, s"$root/base", s"$root/landings", threshold = 0.3)
      .collect().toSeq
    assert(StreamSink.compactIvfLandings(spark, s"$root/landings"))
    val after = Similarity.cosinePairsBlockedFromIndexWithLandings(
      spark, s"$root/base", s"$root/landings", threshold = 0.3)
      .collect().toSeq
    assert(before.nonEmpty && after == before)
    // the generation keeps cell= subdirs so index readers partition-prune
    val gen = new java.io.File(s"$root/landings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("compact="))
    assert(gen.length == 1 &&
      gen.head.listFiles().exists(_.getName.startsWith("cell=")))
    assert(after == Similarity.cosinePairsBlocked(emb, threshold = 0.3,
      nCells = 8).collect().toSeq, "fold must stay equal to from-scratch")
  }

  test("family folds are serve-invariant: BPE pairs, CM sketch, heavy hitters, sample sketch") {
    import graft.ops.{Sketches, TextAnalysis}
    val root = Files.createTempDirectory("graft-land-fam").toString

    val docs = (1L to 90L).map { i =>
      (i, Seq("merge", "scan", "sort", "join")((i % 4).toInt) + " graft")
    }.toDF("doc_id", "text")
    val dParts = (0 to 2).map(m => docs.filter($"doc_id" % 3 === m))
    dParts.zipWithIndex.foreach { case (b, i) =>
      StreamSink.landBatch(TextAnalysis.bpePairCounts(b), s"$root/bpe", i.toLong)
    }
    val bpeBefore = StreamSink.readBpeMerges(spark, s"$root/bpe", 50)
      .collect().toSeq
    assert(StreamSink.compactBpePairs(spark, s"$root/bpe"))
    assert(StreamSink.readBpeMerges(spark, s"$root/bpe", 50)
      .collect().toSeq == bpeBefore && bpeBefore.nonEmpty)

    val rows = (1L to 300L).map(i => (s"g${i % 3}", i % 29)).toDF("g", "id")
    val rParts = (0 to 2).map(m => rows.filter($"id" % 3 === m))
    rParts.zipWithIndex.foreach { case (b, i) =>
      StreamSink.landBatch(Sketches.cmSketch(b, $"g", $"id", 3, 64),
        s"$root/cm", i.toLong)
    }
    val cmBefore = StreamSink.readCmSketch(spark, s"$root/cm")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(StreamSink.compactCmSketch(spark, s"$root/cm"))
    assert(StreamSink.readCmSketch(spark, s"$root/cm")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == cmBefore)

    val items = (1L to 500L).map(i => s"w${(i * 7) % 26}").toDF("item")
    val hParts = (0 to 2).map(m =>
      items.filter(pmod(xxhash64($"item"), lit(3)) === m))
    hParts.zipWithIndex.foreach { case (b, i) =>
      StreamSink.landBatch(Sketches.heavyHitters(b, "item", 32),
        s"$root/hh", i.toLong)
    }
    val hhBefore = StreamSink.readHeavyHitters(spark, s"$root/hh", 32)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(StreamSink.compactHeavyHitters(spark, s"$root/hh", 32))
    assert(StreamSink.readHeavyHitters(spark, s"$root/hh", 32)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == hhBefore &&
      hhBefore.nonEmpty)

    val rnd = new scala.util.Random(0x5AFE5L)
    val vals = (1L to 300L).map(i => (s"g${i % 3}", i, rnd.nextDouble() * 50))
      .toDF("g", "id", "v")
    val vParts = (0 to 2).map(m => vals.filter($"id" % 3 === m))
    vParts.zipWithIndex.foreach { case (b, i) =>
      StreamSink.landBatch(Sketches.sampleSketch(b, $"g", $"id", $"v", 8),
        s"$root/sk", i.toLong)
    }
    val skBefore = StreamSink.readSampleSketch(spark, s"$root/sk", 8)
      .select($"grp", $"h", $"v").collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(StreamSink.compactSampleSketch(spark, s"$root/sk", 8))
    assert(StreamSink.readSampleSketch(spark, s"$root/sk", 8)
      .select($"grp", $"h", $"v").collect().map(_.toSeq).sortBy(_.toString)
      .toSeq == skBefore && skBefore.nonEmpty)
  }

  test("compactTrendStats: moment-sum fold keeps the served fit identical") {
    import graft.ops.TimeSeries
    val root = Files.createTempDirectory("graft-land-tr").toString
    val origin = 1700000000000000L
    val rows = (1L to 120L).map { i =>
      (s"s${i % 3}", new java.sql.Timestamp(1700000000000L + i * 60000L),
        (i % 17).toDouble)
    }.toDF("sym", "ts", "v")
    val parts = (0 to 2).map(m => rows.filter(xxhash64($"ts") % 3 === m))
    parts.zipWithIndex.foreach { case (b, i) =>
      StreamSink.landBatch(
        TimeSeries.trendStatsTime(b, "sym", "ts", "v", origin),
        s"$root/tr", i.toLong)
    }
    val before = StreamSink.readTrend(spark, s"$root/tr", "sym")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(StreamSink.compactTrendStats(spark, s"$root/tr", "sym"))
    val after = StreamSink.readTrend(spark, s"$root/tr", "sym")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(after == before && before.nonEmpty)
  }

  test("compactEvery cadence: auto-folds fire mid-stream, serve invariant, audit readout") {
    // VERDICT r15 #5: nothing used to TRIGGER folds on a schedule — a
    // long-running stream accumulated batch dirs between manual calls.
    // Four slice files read one per trigger, compactEvery=2: folds fire
    // inside the foreachBatch after batches 1 and 3, and the served
    // sketch must equal the direct batch build over everything.
    val root = Files.createTempDirectory("graft-land-cad").toString
    val src = s"$root/src"
    new java.io.File(src).mkdirs()
    val df = (0 until 80).map(i => (i.toLong, s"u${i % 7}"))
      .toDF("event_id", "user")
    (0 until 4).foreach { i =>
      val tmp = s"$root/slice-$i"
      df.filter(pmod($"event_id", lit(4L)) === i).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .get
      val dst = java.nio.file.Paths.get(s"$src/0$i-rows.parquet")
      Files.copy(part.toPath, dst)
      // file-source batch order follows (modTime, path): pin slice order
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 120000L + i * 1000L))
    }
    val stream = spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val land = s"$root/cells"
    val q = StreamSink.toCmSketch(stream, land, s"$root/ckpt",
      "user", "event_id", 3, 16, compactEvery = 2)
    q.processAllAvailable(); q.stop()
    // audit: newest gen is 3 (second fold), all four batches covered,
    // nothing live, still servable
    val audit = Landings.landingAudit(spark, land).head()
    assert(audit.getLong(0) == 3L, s"newest_gen: $audit")
    assert(audit.getLong(1) == 4L, s"covered_batches: $audit")
    assert(audit.getLong(2) == 0L, s"live_batches: $audit")
    assert(audit.getBoolean(5), s"servable: $audit")
    // fold-invariance across the cadence: served == direct batch sketch
    val served = StreamSink.readCmSketch(spark, land)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val direct = graft.ops.Sketches.cmSketch(df, $"user", $"event_id", 3, 16)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(served == direct && served.nonEmpty)
  }
}
