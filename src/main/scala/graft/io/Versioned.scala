package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet lake: a manifest log that adds the three
  * transactional properties the reference's `format("delta")` relied on
  * — ATOMIC commits, SNAPSHOT-ISOLATED reads, and TIME TRAVEL — on top
  * of plain parquet files, with no extra jars (the carried environment
  * gap: no Delta on this classpath; `Lake.resolveFormat` still honors
  * real Delta if its jars ever appear).
  *
  * Protocol (the log-structured core of every lakehouse format):
  *  - data files are IMMUTABLE and land under `<path>/data/<uuid>/` —
  *    a fresh directory per commit, invisible to every reader until
  *    published (readers never list `data/`, they read manifests);
  *  - a commit publishes by writing the file list to a temp name and
  *    RENAMING it to `<path>/_log/v<N>.manifest` — rename is the atomic
  *    primitive (HDFS and POSIX renames are atomic; an S3 deployment
  *    swaps this step for a conditional PUT, same protocol);
  *  - concurrent writers race on the SAME version number and the
  *    rename/create of an existing name fails → the loser re-reads the
  *    log and retries against the next version (optimistic concurrency,
  *    bounded attempts) — append commits compose, never overwrite each
  *    other's files;
  *  - a reader resolves its manifest ONCE; because data files are
  *    immutable and manifests are never edited, the snapshot stays
  *    consistent for the lifetime of the plan no matter how many
  *    commits land meanwhile (snapshot isolation), and any retained
  *    version remains readable (`readAsOf`).
  *
  * Scale shape: the log is metadata-sized (one line per file per
  * version); listing it is one directory scan, never a data scan. Data
  * reads are ordinary pruned parquet scans over the manifest's explicit
  * file list — pushdown, column pruning, and partition-style row-group
  * skipping all apply unchanged. Orphans from crashed pre-publish
  * writers are invisible (no manifest references them) and reclaimed by
  * [[vacuum]]. */
object Versioned {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(path: String) = new Path(s"$path/_log")

  private def manifestPath(path: String, v: Long) =
    new Path(logDir(path), f"v$v%07d.manifest")

  private val ManifestName = """v(\d{7})\.manifest""".r

  private def changesDir(path: String) = new Path(s"$path/_changes")

  private def changeLogPath(path: String, v: Long) =
    new Path(changesDir(path), f"v$v%07d")

  /** All committed versions, ascending; empty for a fresh path. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val dir = logDir(path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case ManifestName(v) => v.toLong
    }.sorted
  }

  /** Latest committed version, if any. */
  def latestVersion(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  private def readManifest(spark: SparkSession, path: String,
      v: Long): Seq[String] = {
    val f = fs(spark, path)
    val in = f.open(manifestPath(path, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Commit `df` as a new version. `mode`:
    *  - `"append"`: the new version references the previous version's
    *    files PLUS the new ones (the running-table shape);
    *  - `"overwrite"`: the new version references only the new files —
    *    prior files stay on disk so every earlier version keeps reading
    *    (time travel) until [[vacuum]] reclaims them.
    * Returns the committed version number. */
  def commit(df: DataFrame, path: String, mode: String = "append",
      maxAttempts: Int = 10, expectedPrev: Option[Long] = None): Long = {
    require(mode == "append" || mode == "overwrite", s"bad mode $mode")
    val spark = df.sparkSession
    val newFiles = stageDataFiles(df, path)
    publish(spark, path, newFiles, maxAttempts, expectedPrev) {
      (prev, staged) =>
        mode match {
          case "append" =>
            prev.map(readManifest(spark, path, _)).getOrElse(Nil) ++ staged
          case "overwrite" => staged
        }
    }
  }

  /** Land `df` as immutable parquet files in a commit-private directory
    * (invisible until a manifest references them); returns their paths. */
  private def stageDataFiles(df: DataFrame, path: String): Seq[String] = {
    val f = fs(df.sparkSession, path)
    val dataDir = s"$path/data/${java.util.UUID.randomUUID}"
    df.write.mode("overwrite").parquet(dataDir)
    f.listStatus(new Path(dataDir)).toSeq
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).map(_.toString)
  }

  /** Optimistic publish loop shared by every commit flavor: losers of a
    * version race retry on the re-read log (append semantics compose
    * across racing writers); `manifestFor(prevVersion, stagedFiles)`
    * builds the manifest content for the attempt. `expectedPrev` is the
    * compare-and-swap form for read-modify-write callers (applyChanges,
    * deleteWhere): a content change that derived its output from
    * snapshot v must ONLY publish as v+1 — if another commit landed
    * meanwhile, retrying on the newer log would silently drop that
    * commit's rows (lost update), so the writer aborts loudly (staged
    * files reclaimed) and the caller recomputes from the current
    * snapshot instead. */
  private def publish(spark: SparkSession, path: String,
      stagedFiles: Seq[String], maxAttempts: Int, expectedPrev: Option[Long])(
      manifestFor: (Option[Long], Seq[String]) => Seq[String]): Long = {
    val f = fs(spark, path)
    f.mkdirs(logDir(path))
    def reclaim(): Unit = stagedFiles.headOption.foreach(first =>
      f.delete(new Path(first).getParent, true))
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val prev = latestVersion(spark, path)
      expectedPrev.foreach { e =>
        if (prev.getOrElse(0L) != e) {
          reclaim() // abort: staged files must not become vacuum-bait
          throw new java.util.ConcurrentModificationException(
            s"Versioned.commit at $path: derived from v$e but v" +
              s"${prev.getOrElse(0L)} is now latest — recompute and retry")
        }
      }
      val next = prev.map(_ + 1L).getOrElse(1L)
      val files = manifestFor(prev, stagedFiles)
      val tmp = new Path(logDir(path), s".tmp-${java.util.UUID.randomUUID}")
      val out = f.create(tmp, false)
      try out.write((files.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
      finally out.close()
      // rename-to-target is the atomic commit point. On HDFS the rename
      // itself refuses an existing target (fully atomic CAS); on a local
      // FS java's rename would replace, so the exists-guard narrows the
      // race to a window acceptable for single-host dev — a real object
      // store swaps this step for a conditional PUT (docstring)
      val won = !f.exists(manifestPath(path, next)) &&
        f.rename(tmp, manifestPath(path, next))
      if (won) return next
      f.delete(tmp, false)
    }
    throw new IllegalStateException(
      s"Versioned.commit: lost the publish race $maxAttempts times at $path")
  }

  /** Snapshot read. `version = None` reads the latest commit; `Some(v)`
    * time-travels. The returned frame is pinned to that version's
    * immutable file list — later commits never leak in. */
  def readAsOf(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no commits at $path"))
    val files = readManifest(spark, path, v)
    require(files.nonEmpty, s"version $v at $path has an empty manifest")
    spark.read.parquet(files: _*)
  }

  /** Admission-gated commit — the transactional form of the
    * data-quality gate ([[graft.ops.Quality]]'s contract: a batch is
    * admitted iff every `n_violations` is 0): commit `df` only when the
    * audit `report` is clean, otherwise leave the lake UNTOUCHED (no
    * data files published, no version consumed — rejected batches are
    * invisible to every reader, which is the whole point of pairing the
    * audit with an atomic commit rather than an in-place append).
    * Returns the committed version, or None for a rejected batch. The
    * report scan is metadata-sized (one row per check). */
  def commitIfClean(df: DataFrame, path: String, mode: String,
      report: DataFrame): Option[Long] = {
    val dirty = report.filter(org.apache.spark.sql.functions
      .col("n_violations") > 0L).count()
    if (dirty == 0L) Some(commit(df, path, mode)) else None
  }

  /** Apply a CDC changeset as ONE atomic versioned commit — MERGE for
    * the manifest lake: `changes` carries the target's data columns
    * plus `opCol` ∈ {insert, update, delete} (exactly
    * [[graft.ops.Cdc.snapshotDiff]]'s change labels, so a captured diff
    * replays directly). Inserts and updates UPSERT (the new row wins);
    * deletes remove the key. The next version's content is built
    * copy-on-write against the CURRENT pinned snapshot (survivors =
    * anti-join on changed keys, then union the upsert rows) and
    * published as one overwrite manifest — readers see the old version
    * or the fully-applied changeset, never an intermediate, and the
    * pre-merge version stays time-travelable (the audit trail an
    * in-place MERGE destroys). Returns the committed version.
    *
    * Rejected up front (one metadata-sized aggregation over the batch):
    * NULL keys, duplicate keys (two ops on one key in a single batch is
    * order-ambiguous), unknown op labels. Scale note: copy-on-write
    * rewrites the full snapshot — right for dimension-sized tables; a
    * partitioned fact table wants [[Lake.mergeInto]]'s touched-
    * partition enumeration instead (same semantics, partition-pruned
    * rewrite). */
  def applyChanges(spark: SparkSession, path: String, changes: DataFrame,
      keyCols: Seq[String], opCol: String = "change",
      coalesceTo: Option[Int] = None): Long = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    // materialize the changeset once: three consumers (validation agg,
    // anti-join keys, upsert rows) would otherwise re-derive the whole
    // capture pipeline; a changeset is ship-the-diff sized by contract
    val chg = changes.localCheckpoint()
    val bad = chg.agg(
        sum(when(keyCols.map(col(_).isNull).reduce(_ || _), 1L)
          .otherwise(0L)).as("nulls"),
        sum(when(!col(opCol).isin("insert", "update", "delete"), 1L)
          .otherwise(0L)).as("badops"),
        (count(lit(1)) - countDistinct(keyCols.head, keyCols.tail: _*))
          .as("dups"))
      .head()
    require(bad.getLong(0) == 0L, s"applyChanges: ${bad.getLong(0)} NULL-key change rows")
    require(bad.getLong(1) == 0L, s"applyChanges: ${bad.getLong(1)} rows with unknown ops")
    require(bad.getLong(2) == 0L,
      s"applyChanges: ${bad.getLong(2)} duplicate keys in one batch (order-ambiguous)")
    val vBase = latestVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no commits at $path"))
    val cur = readAsOf(spark, path, Some(vBase))
    val changedKeys = chg.select(keyCols.map(col): _*)
    val survivors = cur.join(changedKeys, keyCols, "left_anti")
    val upserts = chg.filter(col(opCol).isin("insert", "update"))
      .select(cur.columns.map(col).toSeq: _*)
    // WRITE-SIDE CHANGE LOG (the CDF materialization real lakehouse
    // formats do at commit time): the TRUE row-level diff of this merge
    // — op relabeled against the pinned base (an "insert" on a present
    // key is an update; an "update" on an absent key is an insert; a
    // no-op upsert or a delete of an absent key emits NOTHING), with
    // changed_cols from the before-image — restricted to the touched
    // keys, so it costs one changes-sized join at write time and makes
    // [[changesSince]] O(changes) per version instead of two snapshot
    // scans. Landed under `_changes/v<N>` by atomic directory rename
    // AFTER the manifest publish wins: a crash between publish and
    // rename leaves a committed version without a log, which
    // changesSince covers by falling back to the snapshot diff.
    val valueCols = cur.columns.filterNot(keyCols.contains).toSeq
    val f = fs(spark, path)
    val tmpLog = new Path(changesDir(path), s".tmp-${java.util.UUID.randomUUID}")
    if (valueCols.nonEmpty) {
      val touchedBefore = cur.join(changedKeys, keyCols, "left_semi")
      val logRows = graft.ops.Cdc
        .snapshotDiff(touchedBefore, upserts, keyCols, valueCols)
        .join(upserts, keyCols, "left") // deletes carry NULL after-images
      logRows.write.mode("overwrite").parquet(tmpLog.toString)
    }
    // coalesceTo: copy-on-write targets dimension-SIZED tables (see
    // docstring), where the anti-join's full shuffle-partition fan-out
    // writes mostly-tiny files every merge; callers that know the
    // snapshot is small coalesce the write (narrow, no extra shuffle)
    val next = survivors.unionByName(upserts)
    // CAS on the base version: the overwrite was derived from vBase's
    // snapshot, so it must publish as vBase+1 or abort — a plain
    // optimistic retry here would silently discard any commit that
    // landed between the read and the publish (lost update)
    val v =
      try commit(coalesceTo.map(next.coalesce).getOrElse(next), path,
        "overwrite", expectedPrev = Some(vBase))
      catch { case e: Throwable => f.delete(tmpLog, true); throw e }
    if (valueCols.nonEmpty) f.rename(tmpLog, changeLogPath(path, v))
    v
  }

  /** GDPR / takedown delete propagation — the right-to-be-forgotten
    * pass every production training-data lake needs: remove every row
    * where `pred` IS TRUE as ONE atomic versioned commit, rewriting
    * ONLY the files that contain a matching row. Files without a match
    * are carried into the new manifest BY REFERENCE (spec-asserted):
    * at 100 TB a delete of one user's rows touches the handful of
    * files their rows live in, never the lake.
    *
    * Semantics and guarantees:
    *  - rows where `pred` is NULL are KEPT (delete-where-true, the SQL
    *    DELETE convention) — `filter(!pred)` alone would silently drop
    *    them;
    *  - the rewrite is derived from the pinned latest snapshot and
    *    publishes CAS-guarded as its successor ([[applyChanges]]'s
    *    lost-update rule);
    *  - PRE-delete versions stay readable (time travel — the audit
    *    trail) until [[vacuum]] reclaims their files, after which the
    *    deleted rows are PHYSICALLY gone from disk (spec-proved by
    *    scanning every surviving file);
    *  - a predicate matching nothing is a no-op: no files staged, no
    *    version consumed, `vBase` returned.
    *
    * The hit-file list is the one driver-side collect — bounded by the
    * snapshot's file count (manifest-sized metadata, never data).
    * Compose with the dedup/ANN indexes via
    * [[graft.ops.Dedup.deleteFromShingleIndex]] so a forgotten
    * document's postings disappear with its rows. */
  def deleteWhere(spark: SparkSession, path: String,
      pred: org.apache.spark.sql.Column, coalesceTo: Option[Int] = None): Long = {
    import org.apache.spark.sql.functions._
    deleteCow(spark, path, coalesceTo)(
      snap => snap.filter(pred),
      touched => touched.filter(!coalesce(pred, lit(false))))
  }

  /** [[deleteWhere]] for a DATA-SIZED key set — the bulk-takedown form
    * (forget a SET of users/documents): the keys join as data
    * (semi-join hit detection, anti-join survivors; broadcast when
    * small), never an inlined predicate, so forgetting 10⁶ keys is the
    * same plan as one. Same guarantees: file-granular copy-on-write,
    * CAS publish, keys matching nothing = no-op, time travel until
    * [[vacuum]]. Idempotent by construction — replaying a takedown
    * batch whose keys are already gone matches nothing and consumes no
    * version (what makes [[graft.streaming.StreamSink.toTakedowns]]
    * exactly-once on plain foreachBatch). */
  def deleteKeys(spark: SparkSession, path: String, keys: DataFrame,
      keyCol: String, coalesceTo: Option[Int] = None): Long = {
    import org.apache.spark.sql.functions._
    val gone = keys.select(col(keyCol)).distinct().localCheckpoint()
    deleteCow(spark, path, coalesceTo)(
      snap => snap.join(gone, Seq(keyCol), "left_semi"),
      touched => touched.join(gone, Seq(keyCol), "left_anti"))
  }

  /** Shared copy-on-write delete core: `hits` marks matching rows on
    * the full snapshot (which carries `__f` = its source file), and
    * `survivors` keeps the rows of the TOUCHED files that live on. */
  private def deleteCow(spark: SparkSession, path: String,
      coalesceTo: Option[Int])(
      hits: DataFrame => DataFrame,
      survivors: DataFrame => DataFrame): Long = {
    import org.apache.spark.sql.functions._
    val vBase = latestVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no commits at $path"))
    val files = readManifest(spark, path, vBase)
    // manifest entries and _metadata.file_path may render the same file
    // with different scheme spellings (file:/ vs file:///) — compare on
    // the scheme-less URI path
    def norm(s: String) = new Path(s).toUri.getPath
    val snapshot = spark.read.parquet(files: _*)
      .withColumn("__f", col("_metadata.file_path"))
    val hit = hits(snapshot)
      .select(col("__f")).distinct()
      .collect().map(r => norm(r.getString(0))).toSet
    if (hit.isEmpty) return vBase
    val (touched, carried) = files.partition(f => hit.contains(norm(f)))
    val surv = survivors(spark.read.parquet(touched: _*))
    val staged = stageDataFiles(
      coalesceTo.map(surv.coalesce).getOrElse(surv), path)
    if (staged.isEmpty && carried.isEmpty)
      // a delete that empties the whole table would publish an empty
      // manifest readAsOf treats as corruption — truncation is an
      // explicit overwrite commit, not a predicate delete. (The staged
      // dir holds no parquet files; vacuum reclaims it as an orphan.)
      throw new IllegalArgumentException(
        s"delete at $path removes every row — commit an explicit " +
          "empty overwrite instead")
    publish(spark, path, staged, maxAttempts = 1,
      expectedPrev = Some(vBase)) { (_, s) => carried ++ s }
  }

  /** OPTIMIZE for the manifest lake — the compaction step every
    * log-structured table needs once appends accumulate (each
    * [[commit]] append adds files; read cost grows with file count,
    * not data size): rewrite the LATEST snapshot's content into
    * `targetFiles` files and publish as one CAS-guarded overwrite
    * version. Content-identical (spec-asserted), pre-compact versions
    * stay time-travelable until [[vacuum]] reclaims their files —
    * compaction is a new version, never an in-place rewrite (readers
    * pinned to the old manifest keep streaming its immutable files).
    * Returns the committed version. */
  /** CHANGE-DATA-FEED read between two committed versions — the
    * "what changed since v" API (Delta's CDF / Iceberg's changelog)
    * rebuilt over the manifest lake: both snapshots come through their
    * immutable manifests ([[readAsOf]]) and diff via the q91 keyed
    * full-outer comparison, so the feed is exact row-level
    * insert/update/delete with per-row changed-column lists — the
    * incremental-consumer contract (downstream sync, audit, cache
    * invalidation) without storing any per-commit delta. Cost: two
    * manifest-pruned snapshot reads + one keyed join, independent of
    * how many versions lie between v1 and v2. */
  def diffVersions(spark: SparkSession, path: String, v1: Long, v2: Long,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame =
    graft.ops.Cdc.snapshotDiff(
      readAsOf(spark, path, Some(v1)), readAsOf(spark, path, Some(v2)),
      keyCols, compareCols)

  /** CHANGE-DATA-FEED consumption — [[diffVersions]] upgraded to the
    * incremental-consumer contract (Delta's readChangeFeed shape): the
    * row-level feed for EVERY committed version in (sinceV, latest],
    * one version-pair diff each, with the op, the AFTER-image of
    * `valueCols` (NULL for deletes), and `_commit_version`. `sinceV`
    * below the first committed version reads from genesis (the first
    * snapshot arrives as pure inserts against an empty before-image).
    * Returns None when nothing is newer than the cursor; otherwise the
    * feed plus the new cursor (the max version consumed).
    *
    * Cost: versions committed by [[applyChanges]] read their
    * write-side `_changes/v<N>` log — ONE changes-sized parquet scan
    * per consumed version, O(changes) no matter how big the lake is
    * (the fact-scale asymptote real CDF gives). Versions without a log
    * (plain [[commit]]s, pre-log history, a crash between publish and
    * log rename) fall back to the legacy derivation: two
    * manifest-pruned snapshot reads + one keyed join for that version.
    * Log and diff are provably equal (VersionedSpec's equality
    * property) because the log is the true relabeled diff, not the raw
    * submitted changeset. A replayed upstream merge that changed
    * nothing ([[applyChanges]] is content-idempotent:
    * delete-then-upsert of the same changeset reproduces the snapshot
    * bit-for-bit) shows up here as an EMPTY feed slice — which is what
    * makes a crash-replaying streaming producer exactly-once at the
    * feed level with no markers (q205).
    *
    * Cursor safety (fail-loud, never silently re-emit): a cursor ABOVE
    * the latest version means the caller's feed state belongs to some
    * other lake (e.g. a polluted landing dir) — thrown; a NON-ZERO
    * cursor that is no longer committed means [[vacuum]] outran the
    * consumer and the feed between cursor and the retention horizon is
    * unrecoverable — thrown (the silent alternative would diff against
    * an empty before-image and re-emit the whole table as inserts,
    * double-counting every additive consumer). The empty genesis
    * before-image is reserved for `sinceV = 0`, the fresh-consumer
    * bootstrap. */
  def changesSince(spark: SparkSession, path: String, sinceV: Long,
      keyCols: Seq[String], valueCols: Seq[String]): Option[(DataFrame, Long)] = {
    import org.apache.spark.sql.functions._
    val all = versions(spark, path) // listed ONCE (ascending)
    if (all.isEmpty) return None
    if (sinceV > all.last) throw new IllegalStateException(
      s"changesSince at $path: cursor v$sinceV exceeds latest committed " +
        s"v${all.last} — the cursor was derived from a different lake " +
        "(polluted feed landing?); refusing to drain")
    val vs = all.filter(_ > sinceV)
    if (vs.isEmpty) return None
    val committed = all.toSet
    if (sinceV > 0 && !committed(sinceV)) throw new IllegalStateException(
      s"changesSince at $path: cursor v$sinceV predates retention " +
        s"(earliest retained is v${all.head}) — the feed between them was " +
        "vacuumed and is unrecoverable; re-seed the consumer from a " +
        "snapshot instead of silently re-emitting the table as inserts")
    def snap(v: Long): DataFrame =
      if (v > 0) readAsOf(spark, path, Some(v))
      else readAsOf(spark, path, Some(vs.head)).filter(lit(false)) // genesis
    val feed = (sinceV +: vs.init).zip(vs).map { case (a, b) =>
      val slice = (if (a == b - 1) readChangeLog(spark, path, b, keyCols,
        valueCols)
      else None).getOrElse {
        // legacy / genesis-gap derivation — bind snap(b) ONCE for both
        // the diff and the after-image projection
        val sb = snap(b)
        graft.ops.Cdc.snapshotDiff(snap(a), sb, keyCols, valueCols)
          .join(sb.select((keyCols ++ valueCols).map(col): _*),
            keyCols, "left") // deletes carry NULL after-images
      }
      slice.withColumn("_commit_version", lit(b))
    }.reduce(_.unionByName(_))
    Some((feed, vs.max))
  }

  /** The write-side change log for version `v`, projected to the
    * requested value columns, or None when no usable log exists. The
    * stored log diffs ALL data columns; a caller asking for a SUBSET
    * must see exactly what a subset diff would produce, so updates are
    * re-scoped: changed_cols intersects down to the requested columns
    * and updates whose every changed column falls outside the subset
    * vanish (inserts/deletes always survive — they exist regardless of
    * which columns you compare). */
  private def readChangeLog(spark: SparkSession, path: String, v: Long,
      keyCols: Seq[String], valueCols: Seq[String]): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    val dir = changeLogPath(path, v)
    if (!fs(spark, path).exists(dir)) return None
    val log = spark.read.parquet(dir.toString)
    val have = log.columns.toSet
    val need = keyCols ++ valueCols ++ Seq("change", "changed_cols")
    if (!need.forall(have)) return None // schema drift → legacy fallback
    Some(log
      .withColumn("changed_cols",
        array_intersect(col("changed_cols"), typedLit(valueCols)))
      .filter(col("change") =!= "update" || size(col("changed_cols")) > 0)
      .select((keyCols.map(col) ++ Seq(col("change"), col("changed_cols")) ++
        valueCols.map(col)): _*))
  }

  def compact(spark: SparkSession, path: String, targetFiles: Int = 1): Long = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val vBase = latestVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no commits at $path"))
    val cur = readAsOf(spark, path, Some(vBase))
    commit(cur.repartition(targetFiles), path, "overwrite",
      expectedPrev = Some(vBase))
  }

  /** Commit history as a frame: (version, n_files) per commit —
    * metadata-only, no data scan. */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    versions(spark, path)
      .map(v => (v, readManifest(spark, path, v).size.toLong))
      .toDF("version", "n_files")
  }

  /** Reclaim storage: keep the newest `retainVersions` manifests, delete
    * every data file referenced ONLY by dropped versions, plus orphans
    * from crashed pre-publish writers (data files no retained manifest
    * references). Time travel to a dropped version stops working — the
    * explicit retention trade every lakehouse vacuum makes. */
  def vacuum(spark: SparkSession, path: String, retainVersions: Int = 1): Unit = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val f = fs(spark, path)
    val all = versions(spark, path)
    if (all.isEmpty) return
    val (dropped, retained) = all.splitAt(math.max(all.size - retainVersions, 0))
    val keep = retained.flatMap(readManifest(spark, path, _)).toSet
    // delete unreferenced data files (covers dropped-version files AND
    // crashed writers' orphans), then empty commit dirs, then manifests
    val dataRoot = new Path(s"$path/data")
    if (f.exists(dataRoot)) {
      f.listStatus(dataRoot).foreach { commitDir =>
        val files = f.listStatus(commitDir.getPath).toSeq
        files.filter(s => s.getPath.getName.endsWith(".parquet") &&
            !keep.contains(s.getPath.toString))
          .foreach(s => f.delete(s.getPath, false))
        val left = f.listStatus(commitDir.getPath)
          .exists(_.getPath.getName.endsWith(".parquet"))
        if (!left) f.delete(commitDir.getPath, true)
      }
    }
    dropped.foreach { v =>
      f.delete(manifestPath(path, v), false)
      f.delete(changeLogPath(path, v), true) // its change log goes with it
    }
  }
}
