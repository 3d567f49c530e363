package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.{Lake, Rest}
import graft.model.Schemas
import graft.ops.BarOps

/** The reference's two pipeline drivers, re-expressed over the operator
  * library. Control flow mirrors E1/E2 in SURVEY.md §3; the Spark idioms
  * replace the reference's anti-patterns (ds.isEmpty instead of
  * rdd.isEmpty / limit(1).count — SURVEY.md §4).
  *
  * A23: the API key comes from the environment with a Spark-conf fallback
  * (massive_client.py:14-27).
  */
object Ingest {

  def apiKey(spark: SparkSession, env: Map[String, String] = sys.env): String =
    env.get("MASSIVE_API_KEY")
      .orElse(spark.conf.getOption("spark.massive.api.key"))
      .getOrElse(throw new IllegalStateException(
        "API key not found in env MASSIVE_API_KEY or conf spark.massive.api.key"))

  private def toDf(spark: SparkSession, rows: Seq[graft.model.RawBar]): DataFrame = {
    import spark.implicits._
    // explicit wire schema, never inferred (reference passes schema= to
    // both createDataFrame calls)
    spark.createDataFrame(rows.toDF().rdd, Schemas.raw)
  }

  /** The reference keys the raw lake by granularity one level above the
    * symbol partitions: `<root>/source=minute|daily/symbol=.../`
    * (ingest_massive.py:90-92) — reads of the root discover `source` as a
    * partition column, and the incremental watermark scan stays scoped to
    * the granularity being loaded. */
  private def sourcePath(lakePath: String, g: Windows.Granularity): String =
    s"$lakePath/source=${g.sourceName}"

  /** E1: historical backfill — per-symbol fetch → normalize → watermark
    * dedup → partitioned append under `source=minute|daily`. Returns rows
    * appended per symbol. */
  def historicalBackfill(spark: SparkSession, http: Rest.Http, baseUrl: String,
      symbols: Seq[String], lakePath: String, fullLoad: Boolean,
      userWindow: Option[(String, String)] = None,
      granularity: Windows.Granularity = Windows.OneMinute,
      interPageDelaySec: Double = 12.0,
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong)): Map[String, Long] = {
    val path = sourcePath(lakePath, granularity)
    // lazy + by-name into the planner: the full-lake max(ts) scan only
    // runs when something actually needs the watermark (fullLoad with a
    // user window never does - on a 100 TB lake that is a big job)
    lazy val maxTs =
      if (Lake.exists(spark, path)) BarOps.maxTs(Lake.read(spark, path))
      else None
    val window = Windows.determine(fullLoad, granularity, userWindow, maxTs)
    symbols.map { symbol =>
      val wire = Rest.fetchAggregates(http, baseUrl, symbol, window.start,
        window.end, timespan = granularity.timespan,
        interPageDelaySec = interPageDelaySec, sleep = sleep)
      val raw = toDf(spark, Rest.decodeRaw(wire))
      val normalized = BarOps.normalizeRaw(raw, symbol)
      val deduped = (if (fullLoad) None else maxTs) match {
        case Some(wm) => BarOps.newerThan(normalized, wm)
        case None     => normalized
      }
      val n = deduped.count()
      if (n > 0) Lake.append(deduped, path, Seq("symbol"))
      symbol -> n
    }.toMap
  }

  /** E1 through the DSv2 source: the whole symbol universe extracts
    * concurrently (one InputPartition per symbol — sources/BarsSource),
    * normalizes, watermark-dedups, and appends in ONE distributed job
    * instead of the reference's per-symbol driver loop. Same lake layout
    * and watermark semantics as [[historicalBackfill]]; rows never visit
    * the driver. Returns rows appended. */
  def historicalBackfillParallel(spark: SparkSession, baseUrl: String,
      symbols: Seq[String], lakePath: String, fullLoad: Boolean,
      userWindow: Option[(String, String)] = None,
      granularity: Windows.Granularity = Windows.OneMinute,
      transportKey: Option[String] = None,
      interPageDelaySec: Double = 12.0): Long = {
    val path = sourcePath(lakePath, granularity)
    lazy val maxTs =
      if (Lake.exists(spark, path)) BarOps.maxTs(Lake.read(spark, path))
      else None
    val window = Windows.determine(fullLoad, granularity, userWindow, maxTs)
    var reader = spark.read.format("graft-bars")
      .option("symbols", symbols.mkString(","))
      .option("baseUrl", baseUrl)
      .option("start", window.start).option("end", window.end)
      .option("timespan", granularity.timespan)
      .option("interPageDelaySec", interPageDelaySec.toString)
    transportKey.foreach(k => reader = reader.option("transportKey", k))
    val normalized = BarOps.normalizeTagged(reader.load())
    val deduped = (if (fullLoad) None else maxTs) match {
      case Some(wm) => BarOps.newerThan(normalized, wm)
      case None     => normalized
    }
    // materialize once: without the persist, count() would run the whole
    // REST extract and the append job would run it AGAIN (double API
    // quota, and a live feed could change between the two fetches)
    deduped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = deduped.count()
      if (n > 0) Lake.append(deduped, path, Seq("symbol"), sortCols = Seq("ts"))
      n
    } finally deduped.unpersist()
  }

  /** E2: per-session pipeline — regular bars arrive server-side filtered
    * (session=regular request param); premarket/afterhours are carved out
    * of the full feed with the same Spark predicate, unifying the dual
    * classification mechanism the reference splits between API and Spark
    * (SURVEY.md §3 E2 note). */
  def sessionIngest(spark: SparkSession, http: Rest.Http, baseUrl: String,
      symbols: Seq[String], tableRoot: String, start: String, end: String,
      interPageDelaySec: Double = 12.0,
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong)): Map[String, Long] = {
    def build(symbol: String, wire: Seq[com.fasterxml.jackson.databind.JsonNode]) =
      BarOps.normalizeRaw(toDf(spark, Rest.decodeRaw(wire)), symbol)

    symbols.map { symbol =>
      var appended = 0L
      // regular: server-side session filter
      val regular = build(symbol, Rest.fetchAggregates(http, baseUrl, symbol,
        start, end, session = Some("regular"),
        interPageDelaySec = interPageDelaySec, sleep = sleep))
      if (!regular.isEmpty) {
        Lake.append(regular, s"$tableRoot/regular", Seq("symbol"))
        appended += regular.count()
      }
      // full feed, Spark-side session carve-outs
      val full = build(symbol, Rest.fetchAggregates(http, baseUrl, symbol,
        start, end, interPageDelaySec = interPageDelaySec, sleep = sleep))
      Seq("premarket", "afterhours").foreach { sess =>
        val part = BarOps.filterSession(full, sess)
          .select(full.columns.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
        if (!part.isEmpty) {
          Lake.append(part, s"$tableRoot/$sess", Seq("symbol"))
          appended += part.count()
        }
      }
      symbol -> appended
    }.toMap
  }
}
