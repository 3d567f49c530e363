package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class VersionedSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshPath() =
    java.nio.file.Files.createTempDirectory("versioned").toString + "/tbl"

  private def rows(path: String, v: Option[Long] = None): Set[Long] =
    Versioned.readAsOf(spark, path, v).select($"k").as[Long].collect().toSet

  test("append commits compose; overwrite starts a new snapshot; time travel reads all") {
    val p = freshPath()
    assert(Versioned.commit(Seq(1L, 2L).toDF("k"), p, "append") == 1L)
    assert(Versioned.commit(Seq(3L).toDF("k"), p, "append") == 2L)
    assert(Versioned.commit(Seq(9L).toDF("k"), p, "overwrite") == 3L)
    assert(rows(p, Some(1L)) == Set(1L, 2L))
    assert(rows(p, Some(2L)) == Set(1L, 2L, 3L))
    assert(rows(p, Some(3L)) == Set(9L))
    assert(rows(p) == Set(9L)) // latest
    assert(Versioned.versions(spark, p) == Seq(1L, 2L, 3L))
    val h = Versioned.history(spark, p).as[(Long, Long)].collect().toMap
    assert(h.keySet == Set(1L, 2L, 3L) && h(2L) > h(3L))
  }

  test("snapshot isolation: a resolved reader never sees later commits") {
    val p = freshPath()
    Versioned.commit(Seq(1L, 2L).toDF("k"), p, "append")
    val snapshot = Versioned.readAsOf(spark, p) // resolves v1's file list
    Versioned.commit(Seq(3L, 4L).toDF("k"), p, "append")
    Versioned.commit(Seq(99L).toDF("k"), p, "overwrite")
    // the pinned snapshot still reads exactly v1, actions after commits
    assert(snapshot.select($"k").as[Long].collect().toSet == Set(1L, 2L))
    assert(rows(p) == Set(99L))
  }

  test("publish race: a taken version number forces a retry onto the next") {
    val p = freshPath()
    Versioned.commit(Seq(1L).toDF("k"), p, "append")
    // simulate a racing writer that already published v2
    val f = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fake = Versioned.readAsOf(spark, p) // v1 files
    val v1Manifest = f.open(new org.apache.hadoop.fs.Path(s"$p/_log/v0000001.manifest"))
    val bytes = try {
      val b = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(v1Manifest, b, 4096, false); b.toByteArray
    } finally v1Manifest.close()
    val out = f.create(new org.apache.hadoop.fs.Path(s"$p/_log/v0000002.manifest"), false)
    try out.write(bytes) finally out.close()
    // the loser lands on v3 and its append composes on v2's (= v1's) files
    assert(Versioned.commit(Seq(7L).toDF("k"), p, "append") == 3L)
    assert(rows(p, Some(3L)) == Set(1L, 7L))
    assert(fake.select($"k").as[Long].collect().toSet == Set(1L))
  }

  test("vacuum keeps retained versions readable and reclaims dropped files") {
    val p = freshPath()
    Versioned.commit(Seq(1L, 2L).toDF("k"), p, "append")
    Versioned.commit(Seq(3L).toDF("k"), p, "overwrite")
    Versioned.commit(Seq(4L).toDF("k"), p, "append")
    Versioned.vacuum(spark, p, retainVersions = 2)
    assert(Versioned.versions(spark, p) == Seq(2L, 3L))
    assert(rows(p, Some(2L)) == Set(3L))
    assert(rows(p, Some(3L)) == Set(3L, 4L))
    // v1's exclusive files are gone from disk
    val f = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val left = f.listStatus(new org.apache.hadoop.fs.Path(s"$p/data"))
      .flatMap(d => f.listStatus(d.getPath)).map(_.getPath.getName)
      .count(_.endsWith(".parquet"))
    // exactly the files of v2's overwrite + v3's append survive
    val referenced = (Versioned.versions(spark, p)
      .flatMap(v => Versioned.readAsOf(spark, p, Some(v)).inputFiles)).toSet
    assert(left == referenced.size)
    intercept[Exception](rows(p, Some(1L)))
  }

  test("deleteWhere: rewrites only hit files, carries the rest by reference") {
    val p = freshPath()
    Versioned.commit(Seq(1L, 2L).toDF("k"), p, "append")  // file set A
    Versioned.commit(Seq(10L, 11L).toDF("k"), p, "append") // file set B
    def manifest(v: Long): Seq[String] = {
      val f = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = f.open(new org.apache.hadoop.fs.Path(f"$p/_log/v$v%07d.manifest"))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    }
    val mA = manifest(1L).toSet
    assert(Versioned.deleteWhere(spark, p, $"k" === 10L) == 3L)
    // after-image right; both pre-delete versions still read (audit trail)
    assert(rows(p) == Set(1L, 2L, 11L))
    assert(rows(p, Some(1L)) == Set(1L, 2L))
    assert(rows(p, Some(2L)) == Set(1L, 2L, 10L, 11L))
    // v1's files (no hit) are carried VERBATIM, and the rewrite staged
    // at least one NEW file; reading v3's manifest raw shows the
    // deleted key in none of them
    val m3 = manifest(3L).toSet
    assert(mA.subsetOf(m3))
    assert((m3 -- manifest(2L).toSet).nonEmpty)
    val raw = spark.read.parquet(m3.toSeq: _*).select($"k").as[Long].collect()
    assert(!raw.contains(10L) && raw.toSet == Set(1L, 2L, 11L))
  }

  test("deleteWhere: NULL-evaluating rows are kept; no-op consumes no version") {
    val p = freshPath()
    Versioned.commit(Seq(Some("x"), Some("y"), None).toDF("g"), p, "append")
    // delete-where-TRUE: the NULL row must survive (filter(!pred) alone
    // would drop it with the matching row)
    assert(Versioned.deleteWhere(spark, p, $"g" === "x") == 2L)
    val got = Versioned.readAsOf(spark, p).select($"g")
      .as[Option[String]].collect().toSet
    assert(got == Set(Some("y"), None))
    // predicate matching nothing: same version back, log untouched
    assert(Versioned.deleteWhere(spark, p, $"g" === "zzz") == 2L)
    assert(Versioned.versions(spark, p) == Seq(1L, 2L))
  }

  test("deleteWhere that empties the table leaves a READABLE empty latest version") {
    val p = freshPath()
    Versioned.commit(Seq(1L, 2L).toDF("k"), p, "append")
    // the rewrite stages schema-only parquet, so the empty after-image
    // reads back with the right schema (0 rows), and the pre-delete
    // version stays time-travelable
    assert(Versioned.deleteWhere(spark, p, $"k" > 0L) == 2L)
    val after = Versioned.readAsOf(spark, p)
    assert(after.count() == 0L && after.schema.fieldNames.toSeq == Seq("k"))
    assert(rows(p, Some(1L)) == Set(1L, 2L))
  }

  test("deleteWhere + vacuum: deleted rows are PHYSICALLY gone from every surviving file") {
    val p = freshPath()
    Versioned.commit(Seq(1L, 2L, 3L, 4L).toDF("k"), p, "append")
    Versioned.deleteWhere(spark, p, $"k" % 2L === 0L)
    // pre-vacuum the deleted rows still exist on disk (time travel)
    assert(rows(p, Some(1L)) == Set(1L, 2L, 3L, 4L))
    Versioned.vacuum(spark, p, retainVersions = 1)
    intercept[Exception](rows(p, Some(1L)))
    // scan EVERY parquet file left under the path: the forgotten rows
    // must not exist anywhere, not merely be unreferenced
    val f = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftFiles = f.listStatus(new org.apache.hadoop.fs.Path(s"$p/data"))
      .flatMap(d => f.listStatus(d.getPath)).map(_.getPath.toString)
      .filter(_.endsWith(".parquet")).toSeq
    assert(leftFiles.nonEmpty)
    val everything = spark.read.parquet(leftFiles: _*)
      .select($"k").as[Long].collect().toSet
    assert(everything == Set(1L, 3L))
  }

  test("deleteKeys: data-sized key set, same semantics as deleteWhere, idempotent replay") {
    val p = freshPath()
    Versioned.commit((1L to 20L).toDF("k"), p, "append")
    val gone = Seq(4L, 8L, 12L, 999L).toDF("k") // 999 absent: harmless
    val v2 = Versioned.deleteKeys(spark, p, gone, "k")
    assert(v2 == 2L && rows(p) == (1L to 20L).toSet -- Set(4L, 8L, 12L))
    // replay the SAME batch (the toTakedowns crash-recovery path):
    // keys already gone -> matches nothing -> no version consumed
    assert(Versioned.deleteKeys(spark, p, gone, "k") == 2L)
    assert(Versioned.versions(spark, p) == Seq(1L, 2L))
    assert(rows(p, Some(1L)) == (1L to 20L).toSet) // audit trail intact
  }

  test("compact: fewer files, identical content, pre-compact versions still readable") {
    val p = freshPath()
    (1L to 6L).foreach(k => Versioned.commit(Seq(k).toDF("k"), p, "append"))
    val filesBefore = Versioned.history(spark, p)
      .filter($"version" === 6L).select($"n_files").as[Long].head()
    assert(filesBefore >= 6L)
    assert(Versioned.compact(spark, p, targetFiles = 1) == 7L)
    assert(rows(p) == (1L to 6L).toSet)
    val filesAfter = Versioned.history(spark, p)
      .filter($"version" === 7L).select($"n_files").as[Long].head()
    assert(filesAfter < filesBefore)
    assert(rows(p, Some(3L)) == Set(1L, 2L, 3L)) // time travel intact
    Versioned.vacuum(spark, p, retainVersions = 1)
    assert(rows(p) == (1L to 6L).toSet) // latest survives vacuum
  }

  test("commitIfClean: clean batch commits, dirty batch leaves the lake untouched") {
    import graft.ops.Quality
    val p = freshPath()
    val clean = Seq(1L, 2L).toDF("k")
    val dirty = Seq(Some(3L), None).toDF("k")
    val checks = Seq(Quality.notNull("k.not_null", $"k"))
    assert(Versioned.commitIfClean(clean, p, "append",
      Quality.rowAudit(clean, checks)).contains(1L))
    assert(Versioned.commitIfClean(dirty, p, "append",
      Quality.rowAudit(dirty, checks)).isEmpty)
    // no version consumed, content unchanged
    assert(Versioned.versions(spark, p) == Seq(1L))
    assert(rows(p) == Set(1L, 2L))
  }

  test("readAsOf on an empty path fails loudly") {
    val p = freshPath()
    intercept[IllegalArgumentException](Versioned.readAsOf(spark, p))
  }

  test("applyChanges: upserts replace, inserts add, deletes remove — one atomic version") {
    val p = freshPath()
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    Versioned.commit(base, p, "append")
    val changes = Seq(
      (2L, "B", "update"),   // replace
      (4L, "d", "insert"),   // add
      (3L, "c", "delete"))   // remove (data col carried but ignored)
      .toDF("k", "v", "change")
    val v2 = Versioned.applyChanges(spark, p, changes, Seq("k"))
    assert(v2 == 2L)
    val kv = Versioned.readAsOf(spark, p, Some(2L))
      .select($"k", $"v").as[(Long, String)].collect().toSet
    assert(kv == Set((1L, "a"), (2L, "B"), (4L, "d")))
    // the pre-merge version stays time-travelable and untouched
    assert(Versioned.readAsOf(spark, p, Some(1L))
      .select($"k", $"v").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("commit CAS (expectedPrev): a stale read-modify-write aborts, never loses the interloper") {
    val p = freshPath()
    Versioned.commit(Seq(1L).toDF("k"), p, "append") // v1
    // a writer derives from v1; an interloper lands v2 meanwhile
    Versioned.commit(Seq(9L).toDF("k"), p, "append") // v2
    val e = intercept[java.util.ConcurrentModificationException] {
      Versioned.commit(Seq(99L).toDF("k"), p, "overwrite",
        expectedPrev = Some(1L)) // still expects its v1 base
    }
    assert(e.getMessage.contains("recompute"))
    // the interloper's commit survives; nothing was published, and the
    // aborted writer's staged files were reclaimed (no new data dirs
    // beyond the two committed ones)
    assert(Versioned.versions(spark, p) == Seq(1L, 2L))
    assert(rows(p) == Set(1L, 9L))
    // a CAS against the true latest succeeds
    assert(Versioned.commit(Seq(7L).toDF("k"), p, "overwrite",
      expectedPrev = Some(2L)) == 3L)
    assert(rows(p) == Set(7L))
  }

  test("applyChanges rejects NULL keys, duplicate keys, and unknown ops up front") {
    val p = freshPath()
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), p, "append")
    def bad(rows: Seq[(java.lang.Long, String, String)], msg: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Versioned.applyChanges(spark, p,
          rows.toDF("k", "v", "change"), Seq("k"))
      }
      assert(e.getMessage.contains(msg), s"got: ${e.getMessage}")
      // the lake is untouched by a rejected batch
      assert(Versioned.versions(spark, p) == Seq(1L))
    }
    bad(Seq((null, "x", "insert")), "NULL-key")
    bad(Seq((2L, "x", "upsert")), "unknown ops")
    bad(Seq((2L, "x", "insert"), (2L, "y", "delete")), "duplicate keys")
  }

  test("changesSince: full op set with after-images, NULL deletes, durable cursor") {
    val p = freshPath()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), p) // v1
    Versioned.applyChanges(spark, p, Seq(
      (2L, "B", "update"), (3L, "c", "insert")).toDF("k", "v", "change"),
      Seq("k")) // v2
    Versioned.applyChanges(spark, p, Seq(
      (1L, "a", "delete")).toDF("k", "v", "change"), Seq("k")) // v3
    // from genesis: v1 arrives as pure inserts against an empty before
    val (feed, cur) = Versioned.changesSince(spark, p, 0L, Seq("k"), Seq("v")).get
    assert(cur == 3L)
    val got = feed.select($"k", $"change", $"v", $"_commit_version")
      .as[(Long, String, Option[String], Long)].collect().toSet
    assert(got == Set(
      (1L, "insert", Some("a"), 1L), (2L, "insert", Some("b"), 1L),
      (2L, "update", Some("B"), 2L), (3L, "insert", Some("c"), 2L),
      (1L, "delete", None, 3L))) // deletes carry NULL after-images
    // cursor semantics: only versions past it; nothing new => None
    val (tail2, _) = Versioned.changesSince(spark, p, 2L, Seq("k"), Seq("v")).get
    assert(tail2.select($"_commit_version").as[Long].collect().toSet == Set(3L))
    assert(Versioned.changesSince(spark, p, 3L, Seq("k"), Seq("v")).isEmpty)
  }

  test("applyChanges is content-idempotent: a replayed changeset diffs EMPTY (the q205 exactly-once fact)") {
    val p = freshPath()
    Versioned.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), p)
    val changes = Seq((2L, "B", "update"), (4L, "d", "insert"),
      (3L, "c", "delete")).toDF("k", "v", "change")
    val v2 = Versioned.applyChanges(spark, p, changes, Seq("k"))
    val v3 = Versioned.applyChanges(spark, p, changes, Seq("k")) // crash replay
    assert(v3 == v2 + 1)
    // same snapshot content => the feed shows the replay as an empty diff
    val (feed, _) = Versioned.changesSince(spark, p, v2, Seq("k"), Seq("v")).get
    assert(feed.count() == 0L)
  }

  test("write-side change log ≡ legacy snapshot diff (ops relabeled, no-ops suppressed)") {
    val p = freshPath()
    Versioned.commit(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "v", "w"), p) // v1 — plain commit, NO log
    // a changeset exercising every relabel/suppress rule: insert on a
    // present key (→update), update on an absent key (→insert), no-op
    // upsert (→nothing), delete of an absent key (→nothing), real delete
    val chg = Seq(
      (1L, "A", 10L, "insert"), (5L, "e", 50L, "update"),
      (2L, "b", 20L, "update"), (9L, "x", 0L, "delete"),
      (3L, "c", 30L, "delete")).toDF("k", "v", "w", "change")
    val v2 = Versioned.applyChanges(spark, p, chg, Seq("k"))
    // the log dir exists for the merge commit
    val logDir = java.nio.file.Paths.get(p, "_changes", f"v$v2%07d")
    assert(java.nio.file.Files.exists(logDir))
    def feedRows(d: org.apache.spark.sql.DataFrame) =
      d.select($"k", $"change", $"changed_cols", $"v", $"w", $"_commit_version")
        .as[(Long, String, Seq[String], Option[String], Option[Long], Long)]
        .collect().toSet
    val (logFeed, _) = Versioned.changesSince(spark, p, 1L, Seq("k"), Seq("v", "w")).get
    // force the legacy path by hiding the log, then compare exactly
    val hidden = java.nio.file.Paths.get(p, "_changes", "hidden")
    java.nio.file.Files.move(logDir, hidden)
    val (diffFeed, _) = Versioned.changesSince(spark, p, 1L, Seq("k"), Seq("v", "w")).get
    java.nio.file.Files.move(hidden, logDir)
    assert(feedRows(logFeed) == feedRows(diffFeed))
    assert(feedRows(logFeed) == Set(
      (1L, "update", Seq("v"), Some("A"), Some(10L), v2),
      (5L, "insert", Seq(), Some("e"), Some(50L), v2),
      (3L, "delete", Seq(), None, None, v2)))
  }

  test("change log projected to a SUBSET of value columns matches the subset diff") {
    val p = freshPath()
    Versioned.commit(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "w"), p)
    // row 1 changes only w (outside the subset), row 2 changes v
    Versioned.applyChanges(spark, p, Seq(
      (1L, "a", 11L, "update"), (2L, "B", 20L, "update"))
      .toDF("k", "v", "w", "change"), Seq("k"))
    val (feed, _) = Versioned.changesSince(spark, p, 1L, Seq("k"), Seq("v")).get
    val got = feed.select($"k", $"change", $"changed_cols", $"v")
      .as[(Long, String, Seq[String], String)].collect().toSet
    // the w-only update vanishes — exactly what diffing on v alone yields
    assert(got == Set((2L, "update", Seq("v"), "B")))
  }

  test("changesSince consumer reads the log, never the snapshot (O(changes) proof)") {
    val p = freshPath()
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), p)
    Versioned.applyChanges(spark, p,
      Seq((1L, "A", "update")).toDF("k", "v", "change"), Seq("k"))
    val (feed, _) = Versioned.changesSince(spark, p, 1L, Seq("k"), Seq("v")).get
    val scanned = feed.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scanned.exists(_.contains("_changes")),
      s"expected a _changes scan, got:\n${scanned.mkString("\n")}")
    assert(!scanned.exists(_.contains("/data/")),
      s"consumer plan scans snapshot data files:\n${scanned.mkString("\n")}")
  }

  test("changesSince fails loudly on a vacuumed cursor and on a foreign cursor") {
    val p = freshPath()
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), p) // v1
    Versioned.applyChanges(spark, p,
      Seq((2L, "b", "insert")).toDF("k", "v", "change"), Seq("k")) // v2
    Versioned.applyChanges(spark, p,
      Seq((3L, "c", "insert")).toDF("k", "v", "change"), Seq("k")) // v3
    Versioned.vacuum(spark, p, retainVersions = 1) // only v3 survives
    // cursor v1 predates retention → loud failure, never genesis re-emit
    val e1 = intercept[IllegalStateException] {
      Versioned.changesSince(spark, p, 1L, Seq("k"), Seq("v"))
    }
    assert(e1.getMessage.contains("predates retention"))
    // cursor above latest → wrong lake / polluted feed
    val e2 = intercept[IllegalStateException] {
      Versioned.changesSince(spark, p, 99L, Seq("k"), Seq("v"))
    }
    assert(e2.getMessage.contains("exceeds latest"))
    // fresh consumer (cursor 0) still bootstraps from genesis
    val (feed, cur) = Versioned.changesSince(spark, p, 0L, Seq("k"), Seq("v")).get
    assert(cur == 3L && feed.filter($"change" =!= "insert").count() == 0L)
    // vacuum reclaimed the dropped versions' change logs with them
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(p, "_changes", f"v${2L}%07d")))
  }

  test("cdcMirror rebuilt from the feed alone equals the latest snapshot") {
    val p = freshPath()
    val feedDir = freshPath() + "-feed"
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), p)
    Versioned.applyChanges(spark, p, Seq(
      (1L, "A", "update"), (3L, "c", "insert")).toDF("k", "v", "change"),
      Seq("k"))
    Versioned.applyChanges(spark, p, Seq(
      (2L, "b", "delete"), (3L, "C", "update")).toDF("k", "v", "change"),
      Seq("k"))
    val (feed, cur) = Versioned.changesSince(spark, p, 0L, Seq("k"), Seq("v")).get
    graft.streaming.StreamSink.landBatch(feed, feedDir, cur)
    val mirror = graft.streaming.StreamSink.cdcMirror(spark, feedDir,
      Seq("k"), Seq("v")).as[(Long, String)].collect().toSet
    val snap = Versioned.readAsOf(spark, p, None)
      .select($"k", $"v").as[(Long, String)].collect().toSet
    assert(mirror == snap && mirror == Set((1L, "A"), (3L, "C")))
  }
}
