package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.BarOps.moneySum

/** Declared relational query surface (SURVEY.md §2 Part B, D1–D19).
  *
  * Every query:
  *  - reads only the driver test tables under the given sf dir,
  *  - ends in a total-order sort so result hashes are stable,
  *  - aliases every computed column identically to its oracle SQL,
  *  - uses exact decimal accumulation (`moneySum`) for order-sensitive
  *    double sums so Spark's partial-aggregation order can never drift
  *    from the single-threaded DuckDB oracle.
  *
  * `events.ts` is nanosecond-precision parquet; Spark reads it truncated to
  * microseconds, so every oracle goes through the `EV` CTE which floors to
  * microseconds on the DuckDB side too.
  */
object Queries {

  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      description: String)

  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.CatalystExpressions.register(s)
    val df = s.read.parquet(s"$dir/$name.parquet")
    normalizeTs(df)
  }

  /** Normalize `ts` to session-zoned TimestampType regardless of how the
    * testdata encodes it. Two driver generations exist: int64 nanosecond
    * (readable only via spark.sql.legacy.parquet.nanosAsLong → LongType,
    * floored here to the microsecond domain — the same floor the DuckDB
    * oracles apply via make_timestamp(epoch_ns(ts)//1000)) and
    * timestamp[us] without UTC adjustment (read as TIMESTAMP_NTZ, cast to
    * TimestampType — identical instants under the UTC session, and the
    * type every downstream unix_micros / cast(long) / watermark site
    * expects). */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Scratch dir for write-path queries: RAM-backed when available so the
    * write benchmarks measure the engine, not the host's disk. */
  val scratchRoot: String =
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-scratch"
    else "/tmp/graft-scratch"

  /** Shared streaming-query scaffold: stage the events table into a
    * landing dir (file-stream sources need a directory), open a schema'd
    * parquet readStream with the ns→µs ts floor applied. Used by every
    * streaming query (q19/q32/q39/q40). */
  /** Stage an arbitrary testdata table as a one-file streaming source
    * (the [[stagedEventStream]] mechanics without the events-specific
    * ts normalization) — for streaming queries over non-event tables
    * (q138 streams the documents corpus). */
  def stagedTableStream(s: SparkSession, dir: String, name: String,
      tbl: String): DataFrame = {
    val srcDir = java.nio.file.Paths.get(s"$scratchRoot/$name-src")
    java.nio.file.Files.createDirectories(srcDir)
    val link = srcDir.resolve(s"$tbl.parquet")
    java.nio.file.Files.deleteIfExists(link)
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/$tbl.parquet"), link)
    val rawSchema = s.read.parquet(s"$dir/$tbl.parquet").schema
    s.readStream.schema(rawSchema).parquet(srcDir.toString)
  }

  def stagedEventStream(s: SparkSession, dir: String, name: String): DataFrame = {
    val srcDir = java.nio.file.Paths.get(s"$scratchRoot/$name-src")
    java.nio.file.Files.createDirectories(srcDir)
    val link = srcDir.resolve("events.parquet")
    java.nio.file.Files.deleteIfExists(link)
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), link)
    val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
    normalizeTs(s.readStream.schema(rawSchema).parquet(srcDir.toString))
  }

  /** [[stagedEventStream]] staged as `nFiles` slice files read ONE per
    * micro-batch (maxFilesPerTrigger=1, mtime-ordered like the sentinel
    * scaffold) — for streaming queries that must observe a genuinely
    * MULTI-batch run (q124 exercises the landing-compaction cadence
    * mid-stream; batch-split invariance is exactly what its oracle
    * compare then proves). Slices are deterministic `event_id % nFiles`
    * cuts, so every row streams exactly once. */
  /** First-touch guard for the staged stream-source slices: the slice
    * files are a DETERMINISTIC function of (source parquet, split key,
    * nFiles) — the streaming upstream "queue" fixture, not part of any
    * maintenance operator — so re-materializing them on every run was
    * pure repeated setup (guide §1: time the computation, not the
    * fixture). The marker records the source fingerprint + the slice
    * layout; any change to either re-stages. Every run still REPLAYS the
    * full stream through its own fresh checkpoint — only the queue-file
    * construction is prepaid, exactly like the ensureIndexTable ingest
    * state. */
  private def stagingCurrent(s: SparkSession, srcDir: java.nio.file.Path,
      srcPath: String, layout: String): Boolean = {
    val fp = graft.io.Lake.sourceFingerprint(s, srcPath) + "\n" + layout
    graft.io.Lake.fingerprintCurrent(s, s"$srcDir/_staged_fp", fp)
  }
  private def markStaged(s: SparkSession, srcDir: java.nio.file.Path,
      srcPath: String, layout: String): Unit =
    graft.io.Lake.writeFingerprint(s, s"$srcDir/_staged_fp",
      graft.io.Lake.sourceFingerprint(s, srcPath) + "\n" + layout)

  def stagedEventStreamSplit(s: SparkSession, dir: String, name: String,
      nFiles: Int): DataFrame = {
    val srcDir = java.nio.file.Paths.get(s"$scratchRoot/$name-src")
    val srcPath = s"$dir/events.parquet"
    if (stagingCurrent(s, srcDir, srcPath, s"events|event_id|$nFiles")) {
      val rawSchema = s.read.parquet(srcPath).schema
      return normalizeTs(s.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(srcDir.toFile)
    java.nio.file.Files.createDirectories(srcDir)
    val raw = s.read.parquet(s"$dir/events.parquet")
    val base = System.currentTimeMillis() - 120000L
    (0 until nFiles).foreach { i =>
      val tmp = java.nio.file.Paths.get(s"$scratchRoot/$name-slice-$i")
      raw.filter(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.lit(nFiles.toLong)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .getOrElse(throw new IllegalStateException(s"no slice part file in $tmp"))
      val dst = srcDir.resolve(f"$i%02d-events.parquet")
      java.nio.file.Files.copy(part.toPath, dst)
      // file-source batch order follows (modTime, path): pin slice i
      // strictly before slice i+1, all in the past
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 1000L))
    }
    markStaged(s, srcDir, srcPath, s"events|event_id|$nFiles")
    normalizeTs(s.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString))
  }

  /** [[stagedTableStream]] staged as `nFiles` slice files read ONE per
    * micro-batch, cut by `pmod(keyCol, nFiles)` — the
    * [[stagedEventStreamSplit]] mechanics generalized to any table and
    * any split key. Cutting by the GROUP key (e.g. the basket id for
    * q210's co-visitation maintainer) guarantees every group arrives
    * complete within one micro-batch — the property per-batch
    * distributive aggregation needs. */
  def stagedTableStreamSplitBy(s: SparkSession, dir: String, name: String,
      tbl: String, keyCol: String, nFiles: Int): DataFrame = {
    val srcDir = java.nio.file.Paths.get(s"$scratchRoot/$name-src")
    val srcPath = s"$dir/$tbl.parquet"
    if (stagingCurrent(s, srcDir, srcPath, s"$tbl|$keyCol|$nFiles")) {
      val rawSchema = s.read.parquet(srcPath).schema
      return s.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(srcDir.toFile)
    java.nio.file.Files.createDirectories(srcDir)
    val raw = s.read.parquet(s"$dir/$tbl.parquet")
    val base = System.currentTimeMillis() - 120000L
    // all slices in ONE job: repartition on the slice value puts each
    // slice in exactly one task, partitionBy writes one file per slice
    // dir (nFiles separate filtered scans measured 3x this cost)
    val fns = org.apache.spark.sql.functions
    val tmp = java.nio.file.Paths.get(s"$scratchRoot/$name-slices")
    raw.withColumn("__slice",
        fns.pmod(fns.col(keyCol), fns.lit(nFiles.toLong)))
      .repartition(nFiles, fns.col("__slice"))
      .write.mode("overwrite").partitionBy("__slice").parquet(tmp.toString)
    (0 until nFiles).foreach { i =>
      val sliceDir = tmp.resolve(s"__slice=$i").toFile
      val part = Option(sliceDir.listFiles()).getOrElse(Array.empty)
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .getOrElse(throw new IllegalStateException(s"no slice part file in $sliceDir"))
      val dst = srcDir.resolve(f"$i%02d-$tbl%s.parquet")
      java.nio.file.Files.copy(part.toPath, dst)
      // file-source batch order follows (modTime, path): pin slice i
      // strictly before slice i+1, all in the past
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 1000L))
    }
    markStaged(s, srcDir, srcPath, s"$tbl|$keyCol|$nFiles")
    s.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
  }

  /** [[stagedEventStream]] plus two far-future sentinel rows staged as
    * SEPARATE files, read one file per micro-batch — the scaffolding an
    * OUTER stream-stream join needs to terminate deterministically:
    * unmatched rows only emit when a LATER batch's watermark passes their
    * join bound, and Spark computes batch N's watermark from batch N-1's
    * max event time. So: batch 1 = the events table, batch 2 = sentinel
    * at +10 days (advances the watermark past every real row for batch
    * 3), batch 3 = sentinel at +20 days, during which every real
    * unmatched row flushes. `processAllAvailable` provably covers batch
    * 3 (it is real file data, not a no-data micro-batch, which
    * `processAllAvailable` does not wait for).
    *
    * Each sentinel file carries one `purchase` and one `click` row with
    * `event_id = user_id = -1`, so a sentinel SURVIVES each side's
    * event-type filter and reaches the watermark node — Catalyst pushes
    * those filters below `EventTimeWatermark` into the scan, so a
    * sentinel that fails them is dropped before it can advance anything
    * (measured: the watermark max froze at the last real purchase and
    * the final-day outer rows never flushed). user -1 never equi-joins
    * a real row; callers drop `user_id < 0` rows from the sink
    * snapshot. */
  def stagedEventStreamSentinels(s: SparkSession, dir: String,
      name: String): DataFrame = {
    val srcDir = java.nio.file.Paths.get(s"$scratchRoot/$name-src")
    org.apache.commons.io.FileUtils.deleteQuietly(srcDir.toFile)
    java.nio.file.Files.createDirectories(srcDir)
    val base = System.currentTimeMillis() - 120000L
    def setMtime(p: java.nio.file.Path, offsetMs: Long): Unit =
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(base + offsetMs))
    val events = srcDir.resolve("0-events.parquet")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      events)
    setMtime(events, 0L)
    val raw = s.read.parquet(s"$dir/events.parquet")
    val dayNs = 86400L * 1000000000L
    // the +N-days bump must stay in the RAW schema's ts domain (the
    // sentinel file is read back through the same stream schema):
    // Long nanos under the legacy generation, a timestamp interval
    // under the timestamp[us] generation
    def plus(days: Long): Column =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        col("ts") + lit(days * dayNs)
      else col("ts") + expr(s"INTERVAL $days DAYS")
    def stageSentinel(idx: Int, plusDays: Long): Unit = {
      val tmp = java.nio.file.Paths.get(s"$scratchRoot/$name-sent-$idx")
      val top = raw.orderBy(col("ts").desc).limit(1)
        .withColumn("ts", plus(plusDays))
        .withColumn("event_id", lit(-1L))
        .withColumn("user_id", lit(-1L))
      top.withColumn("event_type", lit("purchase"))
        .unionAll(top.withColumn("event_type", lit("click")))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .getOrElse(throw new IllegalStateException(s"no sentinel part file in $tmp"))
      val dst = srcDir.resolve(s"$idx-sentinel.parquet")
      java.nio.file.Files.copy(part.toPath, dst)
      // file-source batch order follows (modTime, path): keep events
      // strictly oldest, sentinels after, ALL in the past — a
      // future-dated mtime makes the file invisible to the source for
      // the lifetime of a processAllAvailable run
      setMtime(dst, idx * 10000L)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    }
    stageSentinel(1, 10)
    stageSentinel(2, 20)
    normalizeTs(s.readStream.schema(raw.schema).option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString))
  }

  /** Run a streaming DataFrame to completion into a uniquely-named memory
    * sink and return the sink table. Honors the
    * `spark.graft.streaming.stateStore` provider switch (memory | rocksdb)
    * for the stateful operators. */
  /** Stage an arbitrary DERIVED frame as a one-file file-source stream
    * (the [[stagedEventStream]] pattern generalized): coalesce(1) so
    * the staged table arrives as exactly ONE micro-batch — the
    * batch-equivalence harness contract every snapshot-compare
    * streaming oracle relies on (q128's single-batch assertion). */
  def stagedFrameStream(s: SparkSession, df: DataFrame, name: String): DataFrame = {
    val srcDir = s"$scratchRoot/$name-src"
    df.coalesce(1).write.mode("overwrite").parquet(srcDir)
    s.readStream.schema(df.schema).parquet(srcDir)
  }

  def runToMemorySink(df: DataFrame, name: String, mode: String): DataFrame = {
    val s = df.sparkSession
    graft.streaming.StateStores.configure(s)
    val sink = s"${name}_out_${System.nanoTime()}"
    val sq = df.writeStream.outputMode(mode).format("memory").queryName(sink).start()
    try sq.processAllAvailable() finally sq.stop()
    s.table(sink)
  }

  /** DuckDB-side events view with ts floored to Spark's microsecond domain. */
  val EV: String =
    "WITH ev AS (SELECT event_id, make_timestamp(epoch_ns(ts)//1000) AS ts, " +
      "user_id, event_type, value, props FROM events)"

  /** DuckDB word-n-gram comprehension over a string_split list `ws` —
    * the single SQL twin of TextFunctions.wordShingles/WordNGrams, shared
    * by every shingle-replaying oracle (q20/q22/q50) so a change to
    * shingle semantics lands in exactly one fragment per side. */
  def duckWordGrams(ws: String, n: Int): String =
    s"unnest(${duckWordGramsList(ws, n)})"

  /** The same comprehension as a LIST (no unnest) — for oracles that need
    * gram counts in-row (q64's repetition fraction). */
  def duckWordGramsList(ws: String, n: Int): String = {
    val terms = (0 until n)
      .map(j => if (j == 0) s"$ws[i]" else s"$ws[i+$j]").mkString("||' '||")
    s"[$terms FOR i IN generate_series(1, greatest(len($ws)-${n - 1}, 0))]"
  }

  /** DuckDB twin of TextAnalysis.qualityScore (rounded to 6, like the
    * Spark column) — shared by q25 and every oracle that ranks by
    * quality (q67). */
  private[queries] def duckQualityScore: String = dround6(
    "0.3 * least(CAST(len(string_split(text,' ')) AS DOUBLE)/200.0, 1.0) + " +
      "0.4 * (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' '))) + " +
      "0.3 * least(((CAST(length(text) AS DOUBLE) - (len(string_split(text,' ')) - 1)) / len(string_split(text,' '))) / 8.0, 1.0)")

  /** cast(sum(cast(x as decimal))) — DuckDB twin of [[moneySum]]. */
  def dsum(sqlExpr: String): String =
    s"CAST(sum(CAST($sqlExpr AS DECIMAL(18,6))) AS DOUBLE)"

  /** DuckDB twin of Spark's `round(col, 6)` on DOUBLE. Spark's Round
    * does `BigDecimal.valueOf(x)` (= Double.toString — the SHORTEST
    * decimal representation) then HALF_UP; DuckDB's float round goes
    * through x*1e6 whose binary value can land exactly on .5 and round
    * the other way (hit at sf0.1: shortest repr 0.47531249999999997 →
    * Spark 0.475312, DuckDB 0.475313). Casting DOUBLE→VARCHAR in DuckDB
    * also produces the shortest round-trip representation, so
    * VARCHAR→DECIMAL→round replays Spark's exact semantics. */
  def dround6(sqlExpr: String): String = dround(sqlExpr, 6)

  def dround(sqlExpr: String, scale: Int): String =
    s"CAST(round(CAST(CAST($sqlExpr AS VARCHAR) AS DECIMAL(28,18)), $scale) AS DOUBLE)"

  // ---------------------------------------------------------------------
  // D1–D7: projection / casts / sessionization / watermark / write / agg
  // ---------------------------------------------------------------------

  private val q01 = Q(
    (s, dir) => table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("price"), lit("x").as("tag"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("SELECT l_orderkey, l_linenumber, l_extendedprice AS price, 'x' AS tag " +
      "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "D1 projection + rename + literal column")

  private val q02 = Q(
    (s, dir) => {
      val es = col("ts").cast("long")
      table(s, dir, "events")
        .select(col("event_id"), es.as("epoch_s"),
          timestamp_seconds(es - (es % 60)).as("minute_ts"))
        .orderBy("event_id")
    },
    Some(EV + " SELECT event_id, epoch_us(ts)//1000000 AS epoch_s, " +
      "make_timestamp(((epoch_us(ts)//1000000) - ((epoch_us(ts)//1000000) % 60)) * 1000000) AS minute_ts " +
      "FROM ev ORDER BY event_id"),
    "D2 timestamp/epoch cast round-trip with minute floor")

  private val q03 = Q(
    (s, dir) => table(s, dir, "events")
      .withColumn("hhmm", hour(col("ts")) * 100 + minute(col("ts")))
      .filter(col("hhmm") >= 930 && col("hhmm") <= 1600)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy("event_type"),
    Some("SELECT event_type, count(*) AS n FROM events " +
      "WHERE hour(ts)*100 + minute(ts) BETWEEN 930 AND 1600 " +
      "GROUP BY event_type ORDER BY event_type"),
    "D3 session-range filter (reference A11–A13 semantics) + grouped count")

  private val q04 = Q(
    (s, dir) => {
      val ev = table(s, dir, "events")
      val mx = ev.agg(max(col("ts")).as("mx"))
      ev.crossJoin(broadcast(mx))
        .filter(col("ts") > col("mx") - expr("INTERVAL 1 DAY"))
        .agg(count(lit(1)).as("n"))
    },
    Some(EV + " SELECT count(*) AS n FROM ev " +
      "WHERE ts > (SELECT max(ts) - INTERVAL 1 DAY FROM ev)"),
    "D4 watermark: strict ts > (global max - 1 day) (reference A14+A15)")

  private val q05 = Q(
    (s, dir) => {
      val scratch = s"${Queries.scratchRoot}/q05"
      // project before writing: the round-trip's contract is the
      // partition layout + append semantics, and column pruning belongs
      // on the write side too (writing 11 columns to aggregate 2 is the
      // kind of waste that matters at 100 TB)
      val li = table(s, dir, "lineitem").select(col("l_returnflag"), col("l_quantity"))
      // RAM-backed scratch: compression is wasted CPU here (a durable
      // 100 TB lake write would use zstd instead)
      li.write.mode("overwrite").option("compression", "none")
        .partitionBy("l_returnflag").parquet(scratch)
      li.write.mode("append").option("compression", "none")
        .partitionBy("l_returnflag").parquet(scratch)
      s.read.parquet(scratch)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },
    Some("SELECT l_returnflag, 2*count(*) AS n, " +
      s"CAST(2*sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "D5 partitioned parquet write + append + read-back round trip (A20/A21)")

  private val q06 = Q(
    (s, dir) => graft.ops.BarOps.resampleOhlcv(table(s, dir, "events"),
        key = col("user_id"), ts = col("ts"), value = col("value"),
        tieBreak = col("event_id"))
      .orderBy("user_id", "bucket"),
    Some(EV + " SELECT user_id, date_trunc('hour', ts) AS bucket, " +
      s"arg_min(value, ${tsIdKey("ts", "event_id")}) AS open, max(value) AS high, " +
      s"min(value) AS low, arg_max(value, ${tsIdKey("ts", "event_id")}) AS close, " +
      dsum("value") + " AS volume, count(*) AS n " +
      "FROM ev GROUP BY user_id, date_trunc('hour', ts) ORDER BY user_id, bucket"),
    "D6 OHLCV resample per (user, 1h bucket) with deterministic open/close")

  private val q07 = Q(
    (s, dir) => table(s, dir, "events")
      .agg(count(lit(1)).as("n"), min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts")),
    Some(EV + " SELECT count(*) AS n, min(ts) AS min_ts, max(ts) AS max_ts FROM ev"),
    "D7 global count/min/max aggregates (reference A15/A17)")

  // ---------------------------------------------------------------------
  // D8–D15: joins / windows / dedup / set ops / rollup
  // ---------------------------------------------------------------------

  private val q08 = Q(
    (s, dir) => {
      val cut = "1998-07-01"
      val c = table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = table(s, dir, "orders").filter(col("o_orderdate") < lit(cut).cast("timestamp"))
      val l = table(s, dir, "lineitem").filter(col("l_shipdate") > lit(cut).cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        // per-order revenue is a bounded group: unscaled-long fast path
        .agg(graft.ops.BarOps.moneySumFast(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("SELECT o_orderkey, o_orderdate, " +
      dsum("l_extendedprice * (1.0 - l_discount)") + " AS revenue " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON o_orderkey = l_orderkey " +
      "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-07-01' " +
      "AND l_shipdate > TIMESTAMP '1998-07-01' " +
      "GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10"),
    "D8 TPC-H Q3-shape 3-way join + agg + top-10")

  private val q09 = Q(
    (s, dir) => table(s, dir, "supplier")
      .join(broadcast(table(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name")).agg(count(lit(1)).as("n_suppliers"))
      .orderBy("r_name"),
    Some("SELECT r_name, count(*) AS n_suppliers FROM supplier " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "GROUP BY r_name ORDER BY r_name"),
    "D9 broadcast dimension join chain")

  private val q10 = Q(
    (s, dir) => {
      // pre-aggregate revenue per order before joining: replaces the
      // countDistinct expansion with a plain count, and shrinks the join
      // probe side to one row per order. Both aggregation levels carry
      // the revenue as UNSCALED long micros (per-order and per-customer
      // totals are bounded groups), so the exact integer total — and
      // therefore the final double — equals the single-pass oracle sum
      // bit-for-bit at half the decimal-accumulation cost
      import org.apache.spark.sql.types.DecimalType
      val perOrder = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(call_function("graft_unscaled",
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 6)))).as("o_rev_u"))
      table(s, dir, "orders")
        .join(perOrder, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(call_function("graft_make_decimal_38_6", sum(col("o_rev_u")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .filter(col("n_orders") > 5)
        .orderBy(col("revenue").desc, col("o_custkey"))
        .limit(10)
    },
    Some("SELECT o_custkey, " + dsum("l_extendedprice * (1.0 - l_discount)") +
      " AS revenue, count(DISTINCT o_orderkey) AS n_orders " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
      "GROUP BY o_custkey HAVING count(DISTINCT o_orderkey) > 5 " +
      "ORDER BY revenue DESC, o_custkey LIMIT 10"),
    "D10 grouped agg + HAVING + top-k")

  private val q11 = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wv = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
      table(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          row_number().over(w).cast("long").as("rn"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"),
          rank().over(wv).cast("long").as("val_rank"))
        .orderBy("user_id", "rn")
    },
    Some(EV + " SELECT user_id, event_id, " +
      "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn, " +
      "value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta, " +
      "rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS val_rank " +
      "FROM ev ORDER BY user_id, rn"),
    "D11 window functions: row_number, lag delta (returns), rank")

  private val q12 = Q(
    (s, dir) => table(s, dir, "documents")
      .dropDuplicates("lang", "text")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_unique"))
      .orderBy("lang"),
    Some("SELECT lang, count(DISTINCT text) AS n_unique FROM documents " +
      "GROUP BY lang ORDER BY lang"),
    "D12 exact dedup (dropDuplicates) + survivor counts per lang")

  private val q13 = Q(
    (s, dir) => {
      // one-pass INTERSECT/EXCEPT: union the keysets with a source flag and
      // derive both tags from one groupBy — a single keyed shuffle (with
      // map-side partial agg) instead of the two distinct-shuffle pairs
      // that separate intersect + except plans cost over the same inputs
      val ok = table(s, dir, "orders")
        .select(col("o_orderkey").as("okey"), lit(true).as("is_o"))
      val lk = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"), lit(false).as("is_o"))
      ok.unionAll(lk)
        .groupBy(col("okey"))
        .agg(max(col("is_o")).as("in_o"), max(!col("is_o")).as("in_l"))
        .filter(col("in_o"))
        .select(col("okey"),
          when(col("in_l"), lit("both")).otherwise(lit("orders_only")).as("tag"))
        .orderBy("okey", "tag")
    },
    Some("SELECT okey, 'both' AS tag FROM " +
      "(SELECT o_orderkey AS okey FROM orders INTERSECT SELECT l_orderkey FROM lineitem) " +
      "UNION ALL SELECT okey, 'orders_only' AS tag FROM " +
      "(SELECT o_orderkey AS okey FROM orders EXCEPT SELECT l_orderkey FROM lineitem) " +
      "ORDER BY okey, tag"),
    "D13 set operations: INTERSECT / EXCEPT / UNION")

  private val q14 = Q(
    (s, dir) => table(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(moneySum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_price"), col("n"))
      .orderBy("rf", "ls"),
    Some("SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls, " +
      dsum("l_extendedprice") + " AS sum_price, count(*) AS n " +
      "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls"),
    "D14 rollup aggregation")

  private val q15 = Q(
    (s, dir) => {
      // semi + anti in one pass: a left join against the distinct order
      // custkeys with a presence flag derives both tags — one distinct
      // shuffle + one join, instead of semi and anti joins each shuffling
      // customer AND orders (AQE broadcasts the distinct side when small)
      val c = table(s, dir, "customer").select(col("c_custkey"))
      val oc = table(s, dir, "orders").select(col("o_custkey")).distinct()
        .withColumn("has", lit(true))
      c.join(oc, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          when(col("has"), lit("has_orders")).otherwise(lit("no_orders")).as("tag"))
        .orderBy("c_custkey", "tag")
    },
    Some("SELECT c_custkey, 'has_orders' AS tag FROM customer " +
      "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
      "UNION ALL SELECT c_custkey, 'no_orders' AS tag FROM customer " +
      "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
      "ORDER BY c_custkey, tag"),
    "D15 left-semi / left-anti joins")

  // ---------------------------------------------------------------------
  // D16–D19: text / similarity / as-of / streaming
  // ---------------------------------------------------------------------

  private val q16 = Q(
    (s, dir) => table(s, dir, "documents")
      .select(col("lang"), length(col("text")).as("len"),
        size(split(col("text"), " ")).as("toks"),
        regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("len")).cast("double") / count(lit(1))).as("avg_len"),
        sum(col("toks")).as("total_toks"),
        countDistinct(col("first_word")).as("n_first_words"))
      .orderBy("lang"),
    Some("SELECT lang, count(*) AS n_docs, " +
      "CAST(sum(length(text)) AS DOUBLE) / count(*) AS avg_len, " +
      "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_toks, " +
      "count(DISTINCT regexp_extract(text, '^([a-z]+)', 1)) AS n_first_words " +
      "FROM documents GROUP BY lang ORDER BY lang"),
    "D16 text analysis: length / token counts / first-word extraction per lang")

  /** Shared double-precision embedding frame: float→double element cast,
    * plus the L2 norm folded left-to-right (matching DuckDB's list_reduce
    * order so values are bit-identical). */
  private def embeddingsWithNorm(s: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.withNorm(table(s, dir, "embeddings"))

  private def dot(a: Column, b: Column): Column = graft.ops.Similarity.dot(a, b)

  /** DuckDB twin of [[dot]]: sequential left fold over the zipped lists. */
  private[queries] val duckEmb =
    "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
      "n AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) AS nrm FROM e)"

  private[queries] def ddot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), t -> t[1] * t[2]), (a,b) -> a+b)"

  /** DuckDB sort key equivalent to Spark's struct(ts, event_id) ordering:
    * µs epoch scaled into HUGEINT + event_id (arg_min/arg_max don't take
    * struct order values). Valid while event_id < 1e6. */
  private[queries] def tsIdKey(ts: String, id: String): String =
    s"CAST(epoch_us($ts) AS HUGEINT) * 1000000 + $id"

  private val duckDot = ddot("q.v", "c.v")

  private val q17 = Q(
    (s, dir) => {
      val e = embeddingsWithNorm(s, dir)
      val qv = e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
      val cand = e.select(col("vec_id").as("neighbor"), col("v").as("nv"), col("nrm").as("nnrm"))
      graft.ops.Similarity.bruteForceTopK(cand, qv, k = 5)
        .select(col("qid"), col("rnk"), col("neighbor"), round(col("sim"), 6).as("sim"))
        .orderBy("qid", "rnk")
    },
    Some(duckEmb + ", p AS (SELECT q.vec_id AS qid, c.vec_id AS neighbor, " +
      duckDot + " / (q.nrm * c.nrm) AS sim " +
      "FROM n q, n c WHERE q.vec_id % 10 = 0 AND c.vec_id <> q.vec_id), " +
      "r AS (SELECT qid, neighbor, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor) AS rnk FROM p) " +
      "SELECT qid, rnk, neighbor, " + dround6("sim") + " AS sim FROM r WHERE rnk <= 5 ORDER BY qid, rnk"),
    "D17 brute-force cosine top-5 for the vec_id%10=0 query set")

  private val q18 = Q(
    (s, dir) => {
      val ev = table(s, dir, "events")
      val tagged = ev.filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          when(col("event_type") === "purchase", lit(1)).otherwise(lit(0)).as("kind"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_click_id",
          last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("last_click_value",
          last(when(col("kind") === 0, col("value")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("last_click_id"), col("last_click_value"))
        .orderBy("purchase_id")
    },
    Some(EV + ", c AS (SELECT user_id, ts, event_id, value FROM ev WHERE event_type = 'click'), " +
      "p AS (SELECT user_id, ts, event_id FROM ev WHERE event_type = 'purchase') " +
      "SELECT p.event_id AS purchase_id, p.user_id, " +
      s"arg_max(c.event_id, ${tsIdKey("c.ts", "c.event_id")}) AS last_click_id, " +
      s"arg_max(c.value, ${tsIdKey("c.ts", "c.event_id")}) AS last_click_value " +
      "FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts " +
      "GROUP BY p.event_id, p.user_id ORDER BY purchase_id"),
    "D18 as-of join: last click at-or-before each purchase, per user " +
      "(sort-based union+window — no O(n²) range join at scale)")

  private val q19 = Q(
    (s, dir) => {
      val agg = Queries.stagedEventStream(s, dir, "q19")
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("val_sum"))
      Queries.runToMemorySink(agg, "q19", "complete")
        .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("val_sum"))
        .orderBy("bucket", "event_type")
    },
    Some(EV + " SELECT date_trunc('hour', ts) AS bucket, event_type, count(*) AS n, " +
      dsum("value") + " AS val_sum " +
      "FROM ev GROUP BY bucket, event_type ORDER BY bucket, event_type"),
    "D19 structured-streaming 1h tumbling window with watermark; " +
      "oracle is the equivalent batch aggregation")

  // ---------------------------------------------------------------------

  val relational: Map[String, Q] = Map(
    "q01_project" -> q01,
    "q02_cast_time" -> q02,
    "q03_session_filter" -> q03,
    "q04_watermark" -> q04,
    "q05_partitioned_write" -> q05,
    "q06_resample_ohlcv" -> q06,
    "q07_global_aggs" -> q07,
    "q08_join3_topk" -> q08,
    "q09_broadcast_dim_join" -> q09,
    "q10_having_topk" -> q10,
    "q11_window_funcs" -> q11,
    "q12_dedup_exact" -> q12,
    "q13_setops" -> q13,
    "q14_rollup" -> q14,
    "q15_semi_anti" -> q15,
    "q16_text_stats" -> q16,
    "q17_knn_cosine" -> q17,
    "q18_asof_join" -> q18,
    "q19_stream_tumbling" -> q19)

  /** Full registry; extended by the training-data, analytics, and
    * curation packs. */
  def all: Map[String, Q] =
    relational ++ TrainingDataQueries.all ++ AnalyticsQueries.all ++
      CurationQueries.all
}
