package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class LakeSpec extends AnyFunSuite with SparkTest {

  /** events with ts as Long microseconds, whichever generation of the
    * testdata encoding (int64 nanos or timestamp[us]) is on disk — these
    * tests assert file-layout properties over an orderable numeric key. */
  private def evMicros =
    graft.queries.Queries.normalizeTs(
        spark.read.parquet(s"$sf0001/events.parquet"))
      .withColumn("ts", unix_micros(col("ts")))

  test("sorted append produces within-file ordering (row-group skippable)") {
    val dir = s"/tmp/graft-test-lake/sorted-${System.nanoTime()}"
    val ev = evMicros.select(col("event_id"), col("ts"), col("user_id"))
    Lake.append(ev.repartition(4), dir, partitionCols = Nil,
      sortCols = Seq("ts"))

    // every individual file must be internally ts-ordered
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length > 1, "expect multiple task files")
    files.foreach { f =>
      val ts = spark.read.parquet(f).select("ts").collect().map(_.getLong(0))
      assert(ts.sameElements(ts.sorted), s"file $f not ts-ordered")
    }

    // predicate scan over the sorted lake reaches parquet as a pushed filter
    val probe = spark.read.parquet(dir).filter(col("ts") > lit(0L))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,0)]"), plan)
  }

  test("compact merges a small-file partitioned lake, preserving content") {
    val dir = s"/tmp/graft-test-lake/compact-${System.nanoTime()}"
    val ev = evMicros.select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    // simulate a streaming-ingest lake: many tiny files per partition
    Lake.append(ev.repartition(16), dir, partitionCols = Seq("event_type"),
      maxRecordsPerFile = 50)
    val before = spark.read.parquet(dir).collect().toSet
    val stats = Lake.compact(spark, dir, partitionCols = Seq("event_type"),
      targetFileBytes = 64L << 20)
    assert(stats.filesAfter < stats.filesBefore,
      s"expected fewer files: $stats")
    // one task per partition at this size → one file per event_type
    val types = ev.select("event_type").distinct().count()
    assert(stats.filesAfter <= types, s"expected ≤$types files: $stats")
    val after = spark.read.parquet(dir).collect().toSet
    assert(after == before, "compaction must preserve content exactly")
    // no tmp/parked leftovers after a clean swap
    assert(!new java.io.File(dir + "__compact_tmp").exists())
    assert(!new java.io.File(dir + "__compact_old").exists())
  }

  test("sorted compact yields near-disjoint per-file ranges (data skipping)") {
    val dir = s"/tmp/graft-test-lake/compact-sort-${System.nanoTime()}"
    val ev = evMicros.select(col("event_id"), col("ts"), col("value"))
    Lake.append(ev.repartition(16), dir, partitionCols = Nil,
      maxRecordsPerFile = 200)
    val stats = Lake.compact(spark, dir, partitionCols = Nil,
      targetFileBytes = 16L << 10, sortCols = Seq("ts"))
    assert(stats.filesAfter > 1, s"want multiple files to prove ranges: $stats")
    assert(stats.filesAfter < stats.filesBefore, stats.toString)
    // range repartition + in-task sort ⇒ file [min,max] ts windows do not
    // overlap (modulo range-boundary ties) — the property footer-stats
    // skipping needs
    val ranges = Lake.fileStats(spark, dir, "ts")
      .orderBy(col("min_ts"))
      .select(col("min_ts"), col("max_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(lo2 >= hi1 - 1,
        s"overlapping file ranges: ${ranges.mkString(", ")}")
      case _ =>
    }
    // content preserved
    assert(spark.read.parquet(dir).count() == ev.count())
  }

  test("vacuum clears leftovers from an interrupted compact") {
    val dir = s"/tmp/graft-test-lake/vacuum-${System.nanoTime()}"
    val ev = spark.read.parquet(s"$sf0001/events.parquet").limit(100)
    Lake.append(ev, dir, partitionCols = Nil)
    Lake.overwrite(ev, dir + "__compact_tmp", Nil)
    Lake.overwrite(ev, dir + "__compact_old", Nil)
    Lake.vacuum(spark, dir)
    assert(!new java.io.File(dir + "__compact_tmp").exists())
    assert(!new java.io.File(dir + "__compact_old").exists())
    assert(new java.io.File(dir).exists(), "vacuum must not touch live data")
  }

  test("artifact fingerprints: version-salted, stale without the salt, rebuild on source change") {
    val root = java.nio.file.Files.createTempDirectory("graft-fp").toString
    val src = s"$root/src"
    evMicros.limit(10).write.parquet(src)
    val fp = Lake.sourceFingerprint(spark, src)
    // the code-version salt leads the fingerprint: bumping
    // artifactFormatVersion invalidates every recorded marker
    assert(fp.startsWith(s"v${Lake.artifactFormatVersion}\n"))
    val marker = s"$root/_source_fp"
    Lake.writeFingerprint(spark, marker, fp)
    assert(Lake.fingerprintCurrent(spark, marker, fp))
    // a marker from the pre-salt era (raw file list, no version line)
    // must read STALE -> first touch rebuilds (ADVICE r13: the polyHash
    // fold change must invalidate old-layout indexes)
    Lake.writeFingerprint(spark, marker, fp.split("\n", 2)(1))
    assert(!Lake.fingerprintCurrent(spark, marker, fp))
    // and regenerating the source data changes the fingerprint itself
    evMicros.limit(20).write.mode("overwrite").parquet(src)
    assert(Lake.sourceFingerprint(spark, src) != fp)
    // absent source and absent marker are well-defined
    assert(Lake.sourceFingerprint(spark, s"$root/nope")
      == s"v${Lake.artifactFormatVersion}\nabsent")
    assert(!Lake.fingerprintCurrent(spark, s"$root/nomarker", fp))
  }

  test("delta format switches on the classpath probe, parquet fallback otherwise") {
    // the switch itself, both probe outcomes
    assert(Lake.resolveFormat("delta", deltaAvailable = true) == "delta")
    assert(Lake.resolveFormat("delta", deltaAvailable = false) == "parquet")
    assert(Lake.resolveFormat("parquet", deltaAvailable = true) == "parquet")
    // a delta-format append must land readable data under whichever
    // format the real probe selects (parquet fallback in a Delta-less
    // environment, actual Delta if jars ever appear on the classpath)
    val landed = Lake.resolveFormat("delta", Lake.deltaOnClasspath)
    val dir = s"/tmp/graft-test-lake/delta-${System.nanoTime()}"
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_id"), col("event_type"))
    Lake.append(ev, dir, partitionCols = Seq("event_type"), format = "delta")
    assert(spark.read.format(landed).load(dir).count() == ev.count())
  }
}
