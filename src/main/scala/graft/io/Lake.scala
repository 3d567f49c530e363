package graft.io

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned columnar lake reader/writer, reproducing the reference's
  * storage semantics (SURVEY.md §1.1):
  *  - Hive-style `symbol=` partition dirs, append mode
  *    (`symbols(historical)/ingest_massive.py:155`,
  *    `1m-seesion-pipeline/ingest_1m_session.py:273-293`)
  *  - `format ∈ {parquet, delta}` switch; `delta` is used verbatim when
  *    the Delta jars are on the classpath (probed at first use) and
  *    routes to parquet otherwise, with the append+partitionBy semantics
  *    preserved (the reference uses no Delta-only feature beyond
  *    `format("delta")` — SURVEY.md §7).
  *
  * Unlike the reference (explicit "NO coalesce" comment,
  * `ingest_massive.py:153`), the writer exposes `maxRecordsPerFile` so a
  * 1000-executor append does not produce a small-files lake.
  */
object Lake {

  /** A2: parquet scan with schema + partition discovery. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** A3: existence probe. The reference wraps `read.parquet(...).limit(1)`
    * in try/except — the eager part is footer/schema resolution, which is
    * what `Try` captures here. */
  def exists(spark: SparkSession, path: String): Boolean =
    Try(spark.read.parquet(path).schema).isSuccess

  /** Bump whenever CODE that determines on-disk derived-artifact layout
    * changes (hash folds, bucket assignment, file formats). The version
    * salts every [[sourceFingerprint]], so an artifact built by older
    * code reads as stale and rebuilds on first touch — without it, a
    * layout-affecting fix (ADVICE r13: the polyHash ascii→UTF-16 fold,
    * which moves non-ASCII terms to different buckets) leaves pre-fix
    * indexes on disk whose buckets no longer match serve-time probes.
    * v2 = the UTF-16 polyHash fold. */
  val artifactFormatVersion: Int = 2

  /** Deterministic fingerprint of a source file/dir: sorted
    * (name, length, mtime) of its files, salted with
    * [[artifactFormatVersion]]. First-touch derived artifacts
    * (indexes, codebooks) record this next to themselves and rebuild
    * when it changes — without it, regenerating the source dataset in
    * place silently serves a STALE cached artifact (ADVICE r11: q119,
    * where the cached copy IS the query's data, not just an index). */
  def sourceFingerprint(spark: SparkSession, path: String): String =
    s"v$artifactFormatVersion\n" + sourceFingerprintUnsalted(spark, path)

  private def sourceFingerprintUnsalted(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      val st = fs.getFileStatus(p)
      val files =
        if (st.isFile) Array(st)
        else fs.listStatus(p).filter(_.isFile)
      files.map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
        .sorted.mkString("\n")
    }
  }

  /** True iff the fingerprint recorded at `markerPath` equals `fp`
    * (false when absent/unreadable — callers then rebuild). */
  def fingerprintCurrent(spark: SparkSession, markerPath: String,
      fp: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(markerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Try {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        new String(bytes, "UTF-8")
      } finally in.close()
    }.toOption.contains(fp)
  }

  /** Record `fp` at `markerPath` (overwrite). Written LAST in a build
    * so a crash mid-build leaves a missing/stale marker → rebuild. */
  def writeFingerprint(spark: SparkSession, markerPath: String,
      fp: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(markerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(fp.getBytes("UTF-8")) finally out.close()
  }

  /** True iff Delta Lake's DataSource is loadable from `cl` — the
    * classpath probe behind the `delta` format switch. Probed once
    * (lazy) for the library's own classloader. */
  private[io] lazy val deltaOnClasspath: Boolean = deltaProbe(getClass.getClassLoader)

  private[io] def deltaProbe(cl: ClassLoader): Boolean =
    try {
      Class.forName("org.apache.spark.sql.delta.sources.DeltaDataSource",
        false, cl)
      true
    } catch { case _: ClassNotFoundException => false }

  /** `delta` is honored when the Delta jars are actually present and
    * falls back to parquet (append+partitionBy semantics preserved —
    * everything the reference's delta writes rely on) when they are not,
    * so the same pipeline code runs in both environments. */
  private[io] def resolveFormat(format: String,
      deltaAvailable: Boolean = deltaOnClasspath): String = format match {
    case "delta" if !deltaAvailable => "parquet"
    case other                      => other
  }

  /** A20/A21: partitioned append.
    *
    * `sortCols` orders rows *within* each task before writing (no extra
    * shuffle): every parquet row group then carries tight min/max stats
    * on those columns, so later predicate scans (the watermark `ts >`
    * probe, session time ranges) skip whole row groups at the footer —
    * the poor-man's z-order that makes a 100 TB lake scannable. */
  def append(df: DataFrame, path: String, partitionCols: Seq[String],
      format: String = "parquet", maxRecordsPerFile: Long = 0L,
      sortCols: Seq[String] = Nil): Unit = {
    val fmt = resolveFormat(format)
    val src = if (sortCols.nonEmpty)
      df.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
    else df
    var w = src.write.mode("append").format(fmt)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    w.save(path)
  }

  /** Overwrite variant used by tests and the round-trip query. */
  def overwrite(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.save(path)
  }

  /** Bucketed catalog table: rows are hash-clustered into `buckets` files
    * per partition by `bucketCol`, and the layout is recorded in the
    * catalog. Two tables bucketed the same way join with NO exchange on
    * either side — the join becomes a per-bucket zip, the co-location
    * strategy for repeated large⋈large joins (e.g. a bars table and a
    * corporate-actions table both bucketed by symbol). Requires
    * `saveAsTable` (bucket metadata lives in the catalog, not the files);
    * `spark.sql.warehouse.dir` controls placement.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      buckets: Int, sortCol: Option[String] = None): Unit = {
    val s = df.sparkSession
    // UNQUALIFIED names only: for `db.tbl` the default-location guess
    // below would compute the wrong path (and the recursive delete could
    // hit an unrelated directory)
    require(!tableName.contains("."),
      s"writeBucketed: unqualified table name required, got '$tableName'")
    // with the in-memory catalog a fresh JVM starts with no tables, but a
    // managed-table location left by an EARLIER process survives on disk
    // and blocks re-creation — drop both the entry and the location. When
    // the catalog KNOWS the table, delete the location it records (never
    // a path guess); only a catalog-less leftover falls back to the
    // managed default <warehouse>/<name> for the current database.
    val loc: org.apache.hadoop.fs.Path =
      if (s.catalog.tableExists(tableName))
        new org.apache.hadoop.fs.Path(s.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tableName)).location)
      else new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(tableName)))
    s.sql(s"DROP TABLE IF EXISTS `$tableName`")
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.foreach(c => w = w.sortBy(c))
    w.saveAsTable(tableName)
  }

  /** The bucket id Spark encodes in a bucketed data file's name
    * (`part-00000-<uuid>_00003.c000.snappy.parquet` → 3) — the same
    * `_(\d+)` rule Spark's own reader applies when grouping files into
    * buckets, re-stated here so bucket-level maintenance can address
    * individual bucket files without going through a full-table write. */
  private val bucketedFileName = """.*_(\d+)(?:\..*)?$""".r
  private[graft] def bucketIdOf(fileName: String): Option[Int] =
    fileName match {
      case bucketedFileName(id) => Some(id.toInt)
      case _                    => None
    }

  /** The bucket id of a ROW: `pmod(murmur3(col), buckets)` — exactly the
    * assignment Spark's bucketed writer applies (HashPartitioning's
    * partitionIdExpression with the default murmur3 seed, which is also
    * what `functions.hash` computes), so `repartition(buckets, col)`
    * places each bucket's rows in the task that writes that bucket's
    * file. Spec-pinned against the file naming (BucketingSpec). */
  def bucketIdColumn(c: org.apache.spark.sql.Column, buckets: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    pmod(hash(c), lit(buckets))
  }

  private def tableLocation(spark: SparkSession, tableName: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName)).location)

  /** The data files of a bucketed table, with their parsed bucket ids. */
  private def bucketDataFiles(spark: SparkSession,
      loc: org.apache.hadoop.fs.Path): Seq[(Int, org.apache.hadoop.fs.Path)] = {
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(loc)) Nil
    else fs.listStatus(loc).toSeq.filter(_.isFile).map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .flatMap(p => bucketIdOf(p.getName).map(b => (b, p)))
  }

  /** Read ONLY the given bucket ids of a bucketed catalog table — a
    * plain parquet read of exactly those buckets' data files (bucket
    * ids are encoded in the file names), schema pinned to the table's.
    * The input side of a bucket-level rewrite: O(touched buckets) read,
    * never O(index). */
  def readBuckets(spark: SparkSession, tableName: String,
      touched: Seq[Int]): DataFrame = {
    val t = touched.toSet
    val files = bucketDataFiles(spark, tableLocation(spark, tableName))
      .collect { case (b, p) if t(b) => p.toString }
    if (files.isEmpty) spark.table(tableName).limit(0)
    else spark.read.schema(spark.table(tableName).schema)
      .parquet(files: _*)
  }

  /** BUCKET-LEVEL rewrite of a bucketed catalog table — the publish leg
    * of index maintenance priced at O(touched buckets) instead of
    * O(index) (guide §6; VERDICT r18 #1: the fold/append paths were
    * rewriting the WHOLE index to fold a small landing set).
    * `mergedTouched` must be the COMPLETE new content of the `touched`
    * bucket ids; every other bucket's data files are reused byte-for-
    * byte (hard-copied when publishing to a new `into` table, left in
    * place for an in-place rewrite of `baseTable` itself).
    *
    * For one output file per bucket (which is what lets the bucketed
    * scan advertise its sort order), hand `mergedTouched` in already
    * distributed as `repartition(buckets, col(bucketCol))` — keyed
    * aggregations/joins on a superset of {bucketCol} preserve that
    * placement, so one early repartition usually suffices. A frame in
    * any other distribution still publishes correctly (the bucketed
    * writer routes rows by content), just with more files per touched
    * bucket.
    *
    * Crash contract: the merged content is fully materialized in a
    * staging table BEFORE any base file moves, so `into != baseTable`
    * never mutates the base at all (crash-safe; a half-built target is
    * rebuilt by the next publish). In-place (`into == baseTable`)
    * deletes the touched buckets' old files and then moves the new ones
    * in — a crash between the two loses the touched buckets until the
    * append is re-run from its source, the same recovery contract the
    * previous drop-and-rewrite publish had (a transactional table
    * format would close this; environment-absent, A21). */
  def rewriteBuckets(spark: SparkSession, baseTable: String, into: String,
      mergedTouched: DataFrame, touched: Seq[Int], bucketCol: String,
      buckets: Int, sortCol: Option[String] = None,
      check: (DataFrame, DataFrame) => Unit = (_, _) => ()): Unit = {
    require(!baseTable.contains(".") && !into.contains("."),
      s"rewriteBuckets: unqualified table names required, got '$baseTable' -> '$into'")
    val touchedSet = touched.toSet
    val conf = spark.sparkContext.hadoopConfiguration
    val baseLoc = tableLocation(spark, baseTable)
    val fs = baseLoc.getFileSystem(conf)
    // stage the touched buckets' new content as a bucketed table of the
    // same layout: its files carry the same `_NNNNN` bucket suffixes, so
    // they can be adopted by the target directory as-is
    val tmpTbl = into + "__bkt_tmp"
    writeBucketed(mergedTouched, tmpTbl, bucketCol, buckets, sortCol)
    val tmpLoc = tableLocation(spark, tmpTbl)
    // pre-publish gate over the WOULD-BE final content (the staged
    // touched buckets and the untouched base files, handed separately so
    // a check with stored whole-index stats can price itself O(touched)):
    // a failing check leaves the base completely unmodified — stricter
    // than the old full-rewrite publish, which had already dropped the
    // table it was replacing
    try {
      val untouchedFiles = bucketDataFiles(spark, baseLoc)
        .collect { case (b, p) if !touchedSet(b) => p.toString }
      val untouched =
        if (untouchedFiles.isEmpty) spark.table(baseTable).limit(0)
        else spark.read.schema(spark.table(baseTable).schema)
          .parquet(untouchedFiles: _*)
      check(spark.table(tmpTbl), untouched)
    } catch {
      case e: Throwable =>
        spark.sql(s"DROP TABLE IF EXISTS `$tmpTbl`")
        fs.delete(tmpLoc, true)
        throw e
    }
    val tmpFiles = bucketDataFiles(spark, tmpLoc)
    val stray = tmpFiles.collect { case (b, p) if !touchedSet(b) => p.getName }
    require(stray.isEmpty,
      s"rewriteBuckets: merged frame produced rows outside the touched " +
        s"buckets ${touched.sorted.mkString(",")}: ${stray.mkString(", ")}")
    def moveIn(dst: org.apache.hadoop.fs.Path): Unit = tmpFiles.foreach {
      case (_, p) =>
        val target = new org.apache.hadoop.fs.Path(dst, p.getName)
        if (!fs.rename(p, target))
          throw new java.io.IOException(
            s"rewriteBuckets: could not publish $p -> $target")
    }
    if (into == baseTable) {
      bucketDataFiles(spark, baseLoc)
        .collect { case (b, p) if touchedSet(b) => p }
        .foreach(fs.delete(_, false))
      moveIn(baseLoc)
      spark.catalog.refreshTable(baseTable)
    } else {
      // fresh target with the base's schema and bucket layout; untouched
      // bucket files copy over (at lake scale the fold is in-place and
      // this copy disappears; the bench keeps the pristine base reusable)
      val loc: org.apache.hadoop.fs.Path =
        if (spark.catalog.tableExists(into)) tableLocation(spark, into)
        else new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.defaultTablePath(
            org.apache.spark.sql.catalyst.TableIdentifier(into)))
      spark.sql(s"DROP TABLE IF EXISTS `$into`")
      fs.delete(loc, true)
      val sorted = sortCol.map(c => s"SORTED BY (`$c`) ").getOrElse("")
      spark.sql(s"CREATE TABLE `$into` (${spark.table(baseTable).schema.toDDL}) " +
        s"USING parquet CLUSTERED BY (`$bucketCol`) ${sorted}INTO $buckets BUCKETS")
      val intoLoc = tableLocation(spark, into)
      fs.mkdirs(intoLoc)
      bucketDataFiles(spark, baseLoc)
        .collect { case (b, p) if !touchedSet(b) => p }
        .foreach { p =>
          org.apache.hadoop.fs.FileUtil.copy(fs, p, fs,
            new org.apache.hadoop.fs.Path(intoLoc, p.getName), false, conf)
        }
      moveIn(intoLoc)
      spark.catalog.refreshTable(into)
    }
    spark.sql(s"DROP TABLE IF EXISTS `$tmpTbl`")
    fs.delete(tmpLoc, true)
  }

  /** Delta-style latest-wins MERGE (upsert) into a Hive-partitioned
    * parquet lake — the copy-on-write rewrite every mutable ingest
    * pipeline eventually needs (the reference only ever appends behind a
    * watermark; a late correction or a restated row has no path there).
    *
    * Semantics: rows of `updates` replace lake rows with the same
    * `keyCols` value; keys absent from the lake are inserted. `updates`
    * must carry at most one row per key (ENFORCED: a batch with duplicate
    * keys is rejected up front, as is a NULL partition value), and
    * `partitionCol` must be stable under update (derived from the key or
    * an immutable field) — the standard Hive-merge contract; a key that
    * moves partitions would leave its old copy behind. Partition
    * stability is NOT checkable without a key→partition scan of the whole
    * lake, so it remains a caller contract.
    *
    * Scale shape — the whole point of the design:
    *  - **Partition-pruned rewrite.** Only partitions that actually
    *    contain batch keys are read and rewritten; a 10-partition batch
    *    against a 10,000-partition lake touches 0.1% of the data. The
    *    touched-partition list is metadata-sized and collected to the
    *    driver only to drive pruning.
    *  - **No shuffle in the merge itself.** Replace-by-key is a left-anti
    *    join against the batch's key set + union with the batch. The
    *    batch is typically tiny next to the lake, so Catalyst/AQE
    *    broadcasts it and the rewrite is a single map-side pass over the
    *    affected partitions (vs. a window/row_number formulation, which
    *    would shuffle every affected row).
    *  - **Whole-directory publish.** New data is staged to a temp dir and
    *    each touched partition directory is swapped by rename, so readers
    *    never see a half-merged partition. Like [[compact]], the swap is
    *    atomic per partition, not across partitions (rename-based; on
    *    object stores a committer-based variant would replace this step).
    */
  def mergeInto(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit, struct, sum, when}
    val current = read(spark, path)
    val cols = current.columns.toIndexedSeq
    val batch = updates.select(cols.map(col): _*)
    // one pass over the (small-by-design) batch enforces both documented
    // contracts that previously failed SILENTLY: a NULL partition value
    // would stage as __HIVE_DEFAULT_PARTITION__ and then be dropped by
    // the value-reconstructed publish below (data loss), and a key with
    // two batch rows would survive as a duplicate (both rows pass the
    // anti-join untouched)
    val chk = batch.agg(
      count(lit(1)).as("n"),
      countDistinct(struct(keyCols.map(col): _*)).as("nk"),
      sum(when(col(partitionCol).isNull, 1L).otherwise(0L)).as("nulls")).head()
    require(chk.getLong(2) == 0,
      s"mergeInto: $partitionCol is NULL for ${chk.getLong(2)} batch rows — " +
        "null partition values cannot be published")
    require(chk.getLong(0) == chk.getLong(1),
      s"mergeInto: batch has ${chk.getLong(0)} rows but only ${chk.getLong(1)} " +
        s"distinct keys over $keyCols — at most one update row per key")
    val touched = batch.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    val affected = current.filter(col(partitionCol).isInCollection(touched))
    val merged = affected
      .join(batch.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionAll(batch)

    val tmp = path + "__merge_tmp"
    merged.write.mode("overwrite").partitionBy(partitionCol).parquet(tmp)

    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    // publish by ENUMERATING the staged partition directories rather than
    // reconstructing s"$partitionCol=$v" from raw values: Spark escapes
    // special characters in partition dir names, so a reconstructed name
    // can miss the staged dir — under the old fs.exists guard those rows
    // were silently discarded with the tmp dir. Every staged dir is
    // published; a stage/touched mismatch now fails loudly.
    val staged = fs.listStatus(hp(tmp)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(partitionCol + "="))
    if (staged.size != touched.size)
      throw new java.io.IOException(
        s"mergeInto: staged ${staged.size} partition dirs for ${touched.size} " +
          s"touched values under $tmp — refusing to publish a partial merge")
    staged.foreach { st =>
      val dir = st.getPath.getName
      fs.delete(hp(s"$path/$dir"), true)
      if (!fs.rename(st.getPath, hp(s"$path/$dir")))
        throw new java.io.IOException(s"mergeInto: could not publish $dir")
    }
    fs.delete(hp(tmp), true)
  }

  /** Before/after accounting returned by [[compact]]. */
  final case class CompactStats(filesBefore: Long, bytesBefore: Long,
      filesAfter: Long, bytesAfter: Long)

  /** List leaf data files under `path` (recursive, Hadoop FS — works on
    * any supported filesystem), skipping commit markers and hidden files.
    * Returns (fileCount, totalBytes). */
  def dataFileStats(spark: SparkSession, path: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var files = 0L
    var bytes = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        files += 1; bytes += f.getLen
      }
    }
    (files, bytes)
  }

  /** Small-file compaction (the lake `OPTIMIZE` every streaming-ingest
    * table eventually needs): rewrite `path` so data files land near
    * `targetFileBytes`, preserving content, Hive partitioning, and —
    * when `sortCols` is given — clustering rows so each file carries tight
    * min/max footer stats on those columns (z-order-lite: range
    * repartition + in-task sort).
    *
    * Scale shape: ONE shuffle sized `ceil(totalBytes / targetFileBytes)`
    * tasks —
    *  - unsorted + partitioned: hash on the partition columns, so a Hive
    *    partition is rewritten by one task (parallelism = #partitions,
    *    exactly the many-small-partitions regime compaction exists for);
    *  - `sortCols` given: `repartitionByRange` over partitionCols ++
    *    sortCols, which also SPLITS an oversized partition across tasks
    *    by sort range — the giant-partition regime — while dynamic
    *    partitioning still routes rows to the right dirs;
    *  - unpartitioned: plain round-robin repartition.
    * `maxRecordsPerFile` (derived from the observed on-disk bytes/row)
    * caps any file a skewed task would otherwise write.
    *
    * The rewrite goes to `<path>__compact_tmp`, then swaps via two
    * renames (old data parked at `<path>__compact_old`, removed last).
    * Not atomic across the pair — a crash between renames leaves the
    * parked copy recoverable by hand; readers never see a half-written
    * mix because the tmp dir becomes visible only whole. [[vacuum]]
    * clears parked/tmp leftovers from an interrupted run. */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String],
      targetFileBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): CompactStats = {
    import org.apache.spark.sql.functions.col
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val (filesBefore, bytesBefore) = dataFileStats(spark, path)
    val df = spark.read.parquet(path)
    val rows = math.max(1L, df.count())
    val avgRowBytes = math.max(1L, bytesBefore / rows)
    val maxRecords = math.max(1L, targetFileBytes / avgRowBytes)
    val nTasks = math.max(1, math.ceil(bytesBefore.toDouble / targetFileBytes).toInt)
    val clustered =
      if (sortCols.nonEmpty) {
        val keys = (partitionCols ++ sortCols).map(col)
        df.repartitionByRange(nTasks, keys: _*).sortWithinPartitions(keys: _*)
      } else if (partitionCols.nonEmpty)
        df.repartition(nTasks, partitionCols.map(col): _*)
      else df.repartition(nTasks)

    val tmp = path + "__compact_tmp"
    val old = path + "__compact_old"
    var w = clustered.write.mode("overwrite").format("parquet")
      .option("maxRecordsPerFile", maxRecords.toString)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.save(tmp)

    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    fs.delete(hp(old), true)
    if (!fs.rename(hp(path), hp(old)))
      throw new java.io.IOException(s"compact: could not park $path")
    if (!fs.rename(hp(tmp), hp(path))) {
      fs.rename(hp(old), hp(path)) // roll back
      throw new java.io.IOException(s"compact: could not publish $tmp")
    }
    fs.delete(hp(old), true)
    val (filesAfter, bytesAfter) = dataFileStats(spark, path)
    CompactStats(filesBefore, bytesBefore, filesAfter, bytesAfter)
  }

  /** Copy-on-write rewrite of a plain parquet dir, swap-published with
    * [[compact]]'s park/publish/rollback discipline: `transform` maps
    * the current content to the new content; readers see the old table
    * or the new one, never a half-rewritten directory. The building
    * block for index-maintenance deletes ([[graft.ops.Dedup.
    * deleteFromShingleIndex]]) — plain-parquet tables have no manifest
    * log, so atomicity comes from the directory swap. */
  def rewriteInPlace(spark: SparkSession, path: String)(
      transform: DataFrame => DataFrame): Unit = {
    val out = transform(spark.read.parquet(path))
    val tmp = path + "__compact_tmp"
    val old = path + "__compact_old"
    out.write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    fs.delete(hp(old), true)
    if (!fs.rename(hp(path), hp(old)))
      throw new java.io.IOException(s"rewriteInPlace: could not park $path")
    if (!fs.rename(hp(tmp), hp(path))) {
      fs.rename(hp(old), hp(path)) // roll back
      throw new java.io.IOException(s"rewriteInPlace: could not publish $tmp")
    }
    fs.delete(hp(old), true)
  }

  /** Remove `__compact_tmp` / `__compact_old` leftovers an interrupted
    * [[compact]] may have parked next to `path`. */
  def vacuum(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(path + "__compact_tmp", path + "__compact_old").foreach { s =>
      fs.delete(new org.apache.hadoop.fs.Path(s), true)
    }
  }

  /** Per-file min/max of `c` — the footer-stats view a data-skipping
    * audit wants: after a sorted [[compact]], ranges are near-disjoint,
    * which is what makes predicate scans skip whole files/row groups. */
  def fileStats(spark: SparkSession, path: String, c: String): DataFrame =
    fileStatsMulti(spark, path, Seq(c))

  /** [[fileStats]] over several columns at once — one pass, one row per
    * data file with `min_c`/`max_c` for each `c`. This is the scan-plan
    * manifest [[writeZOrdered]] persists: at serve time pruning needs the
    * per-file ranges of EVERY clustering column, not just one. */
  def fileStatsMulti(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as("min_" + c), max(col(c)).as("max_" + c))): _*)
  }

  /** Z-order clustered rewrite (Delta/Iceberg `OPTIMIZE ZORDER BY`): lay
    * `df` out so that files are tight in EVERY `zCols` dimension at once,
    * and persist a per-file min/max manifest next to the data so a
    * multi-dimensional box scan can plan from metadata.
    *
    * How: each clustering column is scaled to a 2^bits bucket id over its
    * observed [min, max] (the span is one broadcast 1-row agg — the q04
    * watermark shape), the bucket bits are interleaved into a single
    * z-value (pure column arithmetic, codegen'd — bit i of column j lands
    * at position i*k+j), and rows are range-partitioned + sorted by that
    * z-value before writing. Locality of the Z curve means each file's
    * min/max box is small in ALL dimensions simultaneously — the property
    * a single-column sort only gives its leading column.
    *
    * The manifest (one row per file: row count + per-column min/max) is
    * written under `<path>/_manifest`: the underscore prefix makes data
    * scans of `path` skip it, so the table stays readable as plain
    * parquet while [[readPruned]] plans against the manifest. Computing
    * it costs one extra column-pruned pass at build time — at serve time
    * it replaces listing+footer reads of every file with a metadata-sized
    * parquet read, which is the difference between O(files) planning and
    * O(matching-files) scanning on a 100 TB lake.
    *
    * Scale shape: ONE range shuffle (`nFiles` tasks) + in-task sort, the
    * same cost class as sorted [[compact]]; the span agg and the manifest
    * pass are column-pruned scans. Numeric clustering columns only
    * (buckets are linear in value — ranks would need a per-column
    * quantile pass; linear is the standard choice and degrades gracefully
    * on skew: files overlap more, pruning stays correct). */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      nFiles: Int, bits: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    require(zCols.size >= 2, "z-order needs at least two clustering columns")
    require(zCols.size * bits <= 62, "z-value must fit a long")
    val spanExprs = zCols.flatMap(c => Seq(
      min(col(c)).cast("double").as("__min_" + c),
      max(col(c)).cast("double").as("__max_" + c)))
    val spanRow = df.agg(spanExprs.head, spanExprs.tail: _*)
    val mins = zCols.map(c => col("__min_" + c))
    val maxs = zCols.map(c => col("__max_" + c))
    val k = zCols.size
    val nBuckets = 1 << bits
    val withSpan = df.crossJoin(broadcast(spanRow))
    // bucket_j = clamp(floor((v - min) * 2^bits / (max - min + 1)))
    val buckets = zCols.zipWithIndex.map { case (c, j) =>
      val scaled = floor((col(c).cast("double") - mins(j)) * nBuckets /
        (maxs(j) - mins(j) + lit(1.0))).cast("long")
      least(greatest(scaled, lit(0L)), lit((nBuckets - 1).toLong))
    }
    // interleave: bit i of bucket j → z bit i*k + j
    val z = (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_ + _)
    withSpan.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .select(df.columns.map(col).toIndexedSeq: _*)
      .write.mode("overwrite").parquet(path)
    fileStatsMulti(df.sparkSession, path, zCols)
      .write.mode("overwrite").parquet(path + "/_manifest")
  }

  /** Manifest-planned box scan over a [[writeZOrdered]] table: read the
    * per-file min/max manifest, keep only files whose range intersects
    * every `(col, lo, hi)` bound, and scan exactly those files (the
    * residual row filter still applies — pruning is file-granular).
    * The manifest is metadata-sized (one row per file), so the collected
    * file list is bounded by the file count, never the data — Iceberg's
    * scan planning in one move. Returns the filtered rows. */
  def readPruned(spark: SparkSession, path: String,
      bounds: Seq[(String, Double, Double)]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val manifest = spark.read.parquet(path + "/_manifest")
    val matching = bounds.foldLeft(manifest) { case (m, (c, lo, hi)) =>
      m.filter(col("max_" + c) >= lo && col("min_" + c) <= hi)
    }.select(col("file")).collect().map(_.getString(0))
    val pruned =
      if (matching.isEmpty)
        spark.read.parquet(path).limit(0) // schema-preserving empty
      else spark.read.parquet(matching.toIndexedSeq: _*)
    bounds.foldLeft(pruned) { case (d, (c, lo, hi)) =>
      d.filter(col(c) >= lo && col(c) <= hi)
    }
  }

  /** File-layout audit of a partitioned lake table — the small-files
    * report that decides when [[compact]] runs (the #1 silent lake
    * killer: a partition accumulating one file per micro-append reads
    * 1000× slower than its compacted twin): per partition value, the
    * file count and the min/max/total rows per file, computed from the
    * scan's own `input_file_name` — no driver-side file listing, the
    * audit scales like any other query over the table. Two-level agg:
    * per-file counts (map-side combined; file names are scan-local so
    * partial aggregation collapses each file inside its own tasks),
    * then per-partition stats over the ≤|files| frame. */
  def fileAudit(spark: SparkSession, path: String,
      partitionCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val perFile = spark.read.parquet(path)
      .groupBy(col(partitionCol), input_file_name().as("__f"))
      .agg(count(lit(1)).as("__n"))
    perFile.groupBy(col(partitionCol))
      .agg(count(lit(1)).as("n_files"), sum(col("__n")).as("n_rows"),
        min(col("__n")).as("min_file_rows"), max(col("__n")).as("max_file_rows"))
  }
}
