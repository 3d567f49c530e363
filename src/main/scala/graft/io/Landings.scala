package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The read/compact side of the streaming landing protocol
  * (`StreamSink.landBatch` writes `batch=<id>` partitions via
  * staging-dir + atomic rename; replays overwrite their own landing —
  * exactly-once on plain parquet).
  *
  * Landings accumulate one `batch=<id>` directory per micro-batch
  * FOREVER under the plain protocol — exactness holds but read-side
  * file counts grow without bound, which at 100 TB is an operational
  * scale-killer (VERDICT r14 #3). [[compactLandings]] is the landing
  * `OPTIMIZE`: fold the current serve set into ONE `compact=<g>`
  * generation directory, committed by a SINGLE atomic rename, with the
  * set of folded batch ids carried in a `_covered.txt` manifest INSIDE
  * the renamed directory (underscore-prefixed, so parquet readers never
  * see it as data). Readers ([[readLandings]]) serve
  * `newest generation ∪ batch dirs not in its manifest`, so every crash
  * point is safe:
  *
  *  - crash before the rename: only a dot-prefixed staging dir exists —
  *    invisible, the old serve set (old gen + all batches) is intact;
  *  - crash after the rename, before cleanup: the new generation is
  *    committed and its manifest covers exactly the dirs that were
  *    folded — readers ignore those dirs even though they still exist,
  *    so nothing is double-counted; cleanup is idempotent GC that any
  *    later compaction re-runs;
  *  - a REPLAYED batch landing after compaction recreates a
  *    `batch=<id>` dir whose id is already in the manifest — ignored,
  *    its rows are already in the generation (the landing protocol's
  *    own exactly-once argument, carried over the fold).
  *
  * Generation numbers strictly increase (`max(live ids, old gen + 1)`),
  * and only the HIGHEST generation is consulted, so a stale generation
  * left by interrupted cleanup can never shadow a newer one.
  *
  * NOT for landings whose `batch` id is semantic payload — drift-report
  * landings use `batch` as the time-series cursor and must stay
  * unfolded. Every other landing family (CM/trend/BPE partials,
  * heavy-hitter and sample sketches, IVF assignments) merges by
  * union or an algebraic `reduce`, which is exactly what the fold
  * applies. */
object Landings {

  /** True iff `dir` holds at least one non-empty parquet data file
    * OUTSIDE hidden (`.`-/`_`-prefixed) path components — the
    * visibility rule Spark's own file index applies. Used to decide
    * whether a landings/partials directory is servable before handing
    * it to schema inference, which throws on a data-file-less tree
    * (ADVICE r14: an all-filtered micro-batch lands an empty
    * `batch=<id>` partition; a crash can leave only a `.staging-*`
    * dir). */
  def hasParquetData(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val root = p.toUri.getPath
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getLen > 0) {
        val rel = f.getPath.toUri.getPath.stripPrefix(root)
        val parts = rel.split('/').filter(_.nonEmpty)
        val visible = parts.forall(s => !s.startsWith(".") && !s.startsWith("_"))
        if (visible && parts.last.endsWith(".parquet")) return true
      }
    }
    false
  }

  /** Resolved landing-directory state: the newest committed compaction
    * generation (number + dir), the batch ids its manifest covers, and
    * the live (uncovered) batch dirs, id-ascending. */
  case class LandingState(gen: Option[(Long, Path)], covered: Set[Long],
      live: Seq[(Long, Path)])

  def landingState(spark: SparkSession, path: String): LandingState = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return LandingState(None, Set.empty, Nil)
    val children = fs.listStatus(root).filter(_.isDirectory)
    val gens = children.map(_.getPath)
      .filter(_.getName.startsWith("compact="))
      .map(p => (p.getName.stripPrefix("compact=").toLong, p))
    val gen = if (gens.isEmpty) None else Some(gens.maxBy(_._1))
    val covered: Set[Long] = gen.map { case (_, p) =>
      val mf = new Path(p, "_covered.txt")
      // the staging rename is atomic, so a committed generation always
      // carries its manifest; a missing one means a hand-damaged dir —
      // treat as covering nothing rather than guessing
      if (!fs.exists(mf)) Set.empty[Long]
      else {
        val in = fs.open(mf)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        txt.split("\\s+").iterator.filter(_.nonEmpty).map(_.toLong).toSet
      }
    }.getOrElse(Set.empty)
    val live = children.map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .map(p => (p.getName.stripPrefix("batch=").toLong, p))
      .filter { case (id, _) => !covered(id) }
      .sortBy(_._1).toSeq
    LandingState(gen, covered, live)
  }

  /** The current serve set of a landing directory: the newest committed
    * generation plus every uncovered `batch=<id>` partition, as ONE
    * frame carrying a `batch` LongType column (real ids for live
    * batches; `-(gen+1)` — disjoint from any real id — for generation
    * rows, so per-batch relational merges like the heavy-hitter
    * SpaceSaving merge keep working across the fold). `None` when
    * nothing servable exists (no dir, or no readable data file —
    * ADVICE r14's schema-inference guard). */
  def readLandings(spark: SparkSession, path: String): Option[DataFrame] = {
    val st = landingState(spark, path)
    val gen = st.gen.filter { case (_, p) => hasParquetData(spark, p.toString) }
    val live = st.live.filter { case (_, p) => hasParquetData(spark, p.toString) }
    val parts = Seq.newBuilder[DataFrame]
    gen.foreach { case (g, p) =>
      parts += spark.read.parquet(p.toString)
        .withColumn("batch", lit(-(g + 1L)).cast("long"))
    }
    if (live.nonEmpty)
      // explicit basePath: one live dir would otherwise infer itself as
      // the base and lose the `batch` partition column
      parts += spark.read.option("basePath", path)
        .parquet(live.map(_._2.toString): _*)
        .withColumn("batch", col("batch").cast("long"))
    parts.result().reduceOption(_.unionByName(_))
  }

  /** Operational readout of a landing directory (VERDICT r15 #5 — the
    * q160 file-audit story extended to landings): one row of
    * (newest_gen, covered_batches, live_batches, live_min/live_max
    * batch id, servable). An unbounded `live_batches` under a
    * long-running stream is the read-side scale smell
    * [[compactLandings]] (or the sinks' `compactEvery` cadence)
    * exists to cap; `newest_gen = -1` means never folded. */
  def landingAudit(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val st = landingState(spark, path)
    val servable = st.gen.exists { case (_, p) =>
      hasParquetData(spark, p.toString) } ||
      st.live.exists { case (_, p) => hasParquetData(spark, p.toString) }
    Seq((st.gen.map(_._1).getOrElse(-1L), st.covered.size.toLong,
      st.live.size.toLong,
      st.live.headOption.map(_._1).getOrElse(-1L),
      st.live.lastOption.map(_._1).getOrElse(-1L), servable))
      .toDF("newest_gen", "covered_batches", "live_batches",
        "live_min", "live_max", "servable")
  }

  /** Retire the ENTIRE current serve set of a landing directory: commit
    * a DATA-LESS `compact=<g>` generation whose manifest covers every
    * member (old generation + all live batch ids), so readers serve
    * NOTHING from this directory while a replayed covered batch stays
    * ignored — deleting the directory outright would re-admit such a
    * replay's rows, losing the landing protocol's exactly-once
    * guarantee. This is the landing-side commit of the fold-into-base
    * compaction ([[graft.streaming.StreamSink.compactCoVisitIntoIndex]]
    * and kin): the data now lives in the base index, the manifest
    * records that these landings must never serve again.
    *
    * Crash-safe like [[compactLandings]] (single atomic rename commits
    * the covering generation; cleanup is idempotent GC). Returns false
    * when there is nothing servable to retire. Single-maintainer,
    * stream-quiescent discipline: a batch landing between the caller's
    * fold and this commit would be retired UNFOLDED — call only after
    * the stream is stopped or from the maintainer thread. */
  def retireLandings(spark: SparkSession, path: String): Boolean = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    val st = landingState(spark, path)
    val genHasData = st.gen.exists { case (_, p) => hasParquetData(spark, p.toString) }
    val liveHasData = st.live.exists { case (_, p) => hasParquetData(spark, p.toString) }
    if (!genHasData && !liveHasData) return false // already retired / nothing servable
    val g2 = math.max(st.live.map(_._1).foldLeft(0L)(math.max),
      st.gen.map(_._1 + 1).getOrElse(0L))
    val newCovered = st.covered ++ st.live.map(_._1)
    val staging = new Path(root, s".staging-compact-$g2")
    fs.delete(staging, true)
    fs.mkdirs(staging)
    val mf = fs.create(new Path(staging, "_covered.txt"), true)
    try mf.write((newCovered.toSeq.sorted.mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally mf.close()
    val target = new Path(root, s"compact=$g2")
    if (fs.exists(target)) fs.delete(target, true) // hand-damaged leftover
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"landing retirement commit failed: rename $staging -> $target")
    // idempotent GC — covered members readers already ignore
    st.gen.foreach { case (_, p) => fs.delete(p, true) }
    st.live.foreach { case (_, p) => fs.delete(p, true) }
    true
  }

  /** Fold the current serve set into one `compact=<g>` generation —
    * the landing `OPTIMIZE`. `reduce` is an optional ALGEBRAIC merge
    * applied to the union before landing (cell-wise CM sums, moment
    * sums, SpaceSaving merge …): sound exactly when merge-of-merges
    * equals merge-of-all, which is the landing families' defining
    * property. `subPartitionCols` preserves serve-side partition
    * pruning (IVF landings stay `cell=`-partitioned); `numFiles` sizes
    * the rewrite (per sub-partition when partitioned).
    *
    * Returns false (no commit) when there is nothing to fold — fewer
    * than two servable members. Safe to call concurrently with new
    * landings: batches that land after the state listing simply stay
    * live for the next fold. Single-maintainer discipline per directory
    * (like any OPTIMIZE); crash-safety per the object doc. */
  def compactLandings(spark: SparkSession, path: String,
      subPartitionCols: Seq[String] = Nil,
      reduce: DataFrame => DataFrame = identity,
      numFiles: Int = 1): Boolean = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    val st = landingState(spark, path)
    if (st.live.isEmpty) return false // nothing new since the last fold
    if (st.gen.isEmpty && st.live.size <= 1) return false // nothing to collapse
    val g2 = math.max(st.live.map(_._1).max, st.gen.map(_._1 + 1).getOrElse(0L))
    val newCovered = st.covered ++ st.live.map(_._1)
    // Build the fold input from EXACTLY the members listed in `st` (a
    // batch landing between the listing and the read must stay live for
    // the next fold, never be folded while uncovered). Shape matches
    // [[readLandings]] — a `batch` column distinguishes members, so
    // relational reducers (SpaceSaving merge) see per-summary identity;
    // it is dropped before landing (generations never store it).
    val genPart = st.gen
      .filter { case (_, p) => hasParquetData(spark, p.toString) }
      .map { case (g, p) => spark.read.parquet(p.toString)
        .withColumn("batch", lit(-(g + 1L)).cast("long")) }
    val liveWithData =
      st.live.filter { case (_, p) => hasParquetData(spark, p.toString) }
    val livePart =
      if (liveWithData.isEmpty) None
      else Some(spark.read.option("basePath", path)
        .parquet(liveWithData.map(_._2.toString): _*)
        .withColumn("batch", col("batch").cast("long")))
    val staging = new Path(root, s".staging-compact-$g2")
    fs.delete(staging, true)
    (genPart.toSeq ++ livePart).reduceOption(_.unionByName(_)) match {
      case Some(u) =>
        val df = reduce(u).drop("batch")
        val out =
          if (subPartitionCols.nonEmpty)
            df.repartition(numFiles, subPartitionCols.map(col): _*)
          else df.coalesce(numFiles)
        var w = out.write.mode("overwrite").format("parquet")
        if (subPartitionCols.nonEmpty)
          w = w.partitionBy(subPartitionCols: _*)
        w.save(staging.toString)
      case None => fs.mkdirs(staging) // all members empty: bare manifest
    }
    val mf = fs.create(new Path(staging, "_covered.txt"), true)
    try mf.write((newCovered.toSeq.sorted.mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally mf.close()
    val target = new Path(root, s"compact=$g2")
    if (fs.exists(target)) fs.delete(target, true) // hand-damaged leftover
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"landing compaction commit failed: rename $staging -> $target")
    // idempotent GC — a crash anywhere below leaves covered dirs that
    // readers already ignore and the next fold re-deletes
    st.gen.foreach { case (_, p) => fs.delete(p, true) }
    st.live.foreach { case (_, p) => fs.delete(p, true) }
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith(".staging-compact-") ||
        (p.getName.startsWith("compact=") &&
          p.getName.stripPrefix("compact=").toLong < g2) ||
        (p.getName.startsWith("batch=") &&
          newCovered(p.getName.stripPrefix("batch=").toLong)))
      .foreach(fs.delete(_, true))
    true
  }
}
