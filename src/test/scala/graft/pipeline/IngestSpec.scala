package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.io.{Lake, Rest}

/** Offline pipeline tests: stubbed HTTP transport drives the full E1/E2
  * control flow (pagination, retry, windowing, watermark dedup, partitioned
  * append) with zero network. */
class IngestSpec extends AnyFunSuite with SparkTest {

  /** Bars at minute offsets from a base epoch, as wire JSON. */
  private def page(results: Seq[Long], next: Option[String]): String = {
    val rows = results.map(t =>
      s"""{"t":$t,"o":1.0,"h":2.0,"l":0.5,"c":1.5,"v":100.0,"vw":1.2,"n":3.0}""")
      .mkString("[", ",", "]")
    val nextField = next.map(u => s""","next_url":"$u"""").getOrElse("")
    s"""{"results":$rows$nextField}"""
  }

  private val base = 1704067200000L // 2024-01-01 00:00:00 UTC
  private def minuteMs(i: Int): Long = base + i * 60000L

  test("fetchAggregates follows next_url cursors and honors the page delay") {
    var sleeps = Vector.empty[Double]
    val pages = Map(
      "http://x/v2/aggs/ticker/AAPL/range/1/minute/2024-01-01/2024-01-02" ->
        page(Seq(minuteMs(0), minuteMs(1)), Some("http://x/page2")),
      "http://x/page2" -> page(Seq(minuteMs(2)), None))
    val http = new Rest.Http {
      def get(url: String, params: Map[String, String]) = {
        if (url.endsWith("minute/2024-01-01/2024-01-02")) {
          assert(params("limit") == "50000" && params("sort") == "asc")
        }
        Rest.HttpResponse(200, pages(url))
      }
    }
    val rows = Rest.fetchAggregates(http, "http://x", "AAPL", "2024-01-01",
      "2024-01-02", sleep = sleeps :+= _)
    assert(rows.size == 3)
    assert(sleeps == Vector(12.0)) // one delay between two pages
  }

  test("retry policy: 429 honors Retry-After, 5xx backs off exponentially, 4xx fails fast") {
    var sleeps = Vector.empty[Double]
    var calls = 0
    val flaky = new Rest.Http {
      def get(url: String, params: Map[String, String]) = {
        calls += 1
        calls match {
          case 1 => Rest.HttpResponse(429, "", Map("Retry-After" -> "7"))
          case 2 => Rest.HttpResponse(503, "")
          case _ => Rest.HttpResponse(200, "ok")
        }
      }
    }
    val client = new Rest.RetryingHttp(flaky, sleep = sleeps :+= _)
    assert(client.get("http://x", Map.empty).body == "ok")
    assert(sleeps == Vector(7.0, 2.0 * 2.0)) // Retry-After, then base*factor^1
    val fatal = new Rest.Http {
      def get(url: String, params: Map[String, String]) = Rest.HttpResponse(404, "")
    }
    intercept[RuntimeException] {
      new Rest.RetryingHttp(fatal, sleep = _ => ()).get("http://x", Map.empty)
    }
  }

  test("ticker universe keeps the fixed CS/PFD x active/delisted order") {
    val http = new Rest.Http {
      def get(url: String, params: Map[String, String]) = {
        val tag = s"${params("type")}-${params("active")}"
        val body = tag match {
          case "CS-true" if !params.contains("cursor") =>
            """{"results":[{"ticker":"A"}],"next_url":"http://x/v3/reference/tickers?cursor=c2"}"""
          case "CS-true" => """{"results":[{"ticker":"B"}]}"""
          case "CS-false" => """{"results":[{"ticker":"DEAD"}]}"""
          case "PFD-true" => """{"results":[{"ticker":"P1"}]}"""
          case "PFD-false" => """{"results":[{"ticker":"P0"}]}"""
        }
        Rest.HttpResponse(200, body)
      }
    }
    val universe = Rest.fetchTickerUniverse(http, "http://x")
    assert(universe == Seq("A", "B", "DEAD", "P1", "P0"))
  }

  test("window planner: full defaults, user window, incremental 1-day overlap") {
    import Windows._
    val today = java.time.LocalDate.parse("2024-06-01")
    assert(determine(fullLoad = true, OneMinute, None, None, today) ==
      LoadWindow("2015-01-01", "2024-06-01"))
    assert(determine(fullLoad = true, OneDay, None, None, today) ==
      LoadWindow("2000-01-01", "2024-06-01"))
    assert(determine(fullLoad = true, OneMinute, Some(("2020-01-01", "2020-02-01")),
      None, today) == LoadWindow("2020-01-01", "2020-02-01"))
    val maxTs = Some(Timestamp.valueOf("2024-05-20 15:30:00"))
    assert(determine(fullLoad = false, OneMinute, None, maxTs, today) ==
      LoadWindow("2024-05-19", "2024-06-01")) // minus one day
    assert(determine(fullLoad = false, OneMinute, None, None, today) ==
      LoadWindow("2015-01-01", "2024-06-01")) // empty lake
  }

  test("E1 backfill: appends partitioned bars, incremental run dedups the overlap") {
    val lakeDir = Files.createTempDirectory("graft-lake").toString + "/bars"
    def httpFor(ts: Seq[Long]) = new Rest.Http {
      def get(url: String, params: Map[String, String]) =
        Rest.HttpResponse(200, page(ts, None))
    }
    // initial full load: minutes 0-2
    val r1 = Ingest.historicalBackfill(spark, httpFor((0 to 2).map(minuteMs(_))),
      "http://x", Seq("AAPL"), lakeDir, fullLoad = true,
      userWindow = Some(("2024-01-01", "2024-01-02")), sleep = _ => ())
    assert(r1("AAPL") == 3)
    // incremental refetch overlaps minutes 1-2, adds 3-4: only 2 new rows
    val r2 = Ingest.historicalBackfill(spark, httpFor((1 to 4).map(minuteMs(_))),
      "http://x", Seq("AAPL"), lakeDir, fullLoad = false, sleep = _ => ())
    assert(r2("AAPL") == 2)
    val lake = Lake.read(spark, lakeDir)
    assert(lake.count() == 5)
    assert(lake.select("ts").distinct().count() == 5) // overlap deduped
    assert(lake.schema("symbol").dataType.typeName == "string") // partition col back
  }

  test("E1 daily (1d) backfill: /range/1/day/ URL, source=daily layout, incremental dedup") {
    val root = Files.createTempDirectory("graft-lake-1d").toString + "/bars"
    def dayMs(i: Int): Long = base + i * 86400000L
    var urls = Vector.empty[String]
    def httpFor(ts: Seq[Long]) = new Rest.Http {
      def get(url: String, params: Map[String, String]) = {
        urls :+= url
        Rest.HttpResponse(200, page(ts, None))
      }
    }
    val r1 = Ingest.historicalBackfill(spark, httpFor((0 to 2).map(dayMs)),
      "http://x", Seq("AAPL"), root, fullLoad = true,
      userWindow = Some(("2024-01-01", "2024-02-01")),
      granularity = Windows.OneDay, sleep = _ => ())
    assert(r1("AAPL") == 3)
    assert(urls.forall(_.contains("/range/1/day/")), urls.mkString(", "))
    // reference layout: <root>/source=daily/symbol=.../ (ingest_massive.py:90-92)
    assert(Lake.exists(spark, s"$root/source=daily"))
    assert(!Lake.exists(spark, s"$root/source=minute"))
    // incremental: overlap days 1-2 dedup against the watermark, 3-4 append
    val r2 = Ingest.historicalBackfill(spark, httpFor((1 to 4).map(dayMs)),
      "http://x", Seq("AAPL"), root, fullLoad = false,
      granularity = Windows.OneDay, sleep = _ => ())
    assert(r2("AAPL") == 2)
    val lake = Lake.read(spark, root)
    assert(lake.count() == 5)
    // reading the lake ROOT discovers source as a partition column, so a
    // 1m + 1d lake stays one logically-unioned table
    assert(lake.schema.fieldNames.contains("source"))
  }

  test("DSv2 source honors the timespan option (day URLs, default minute)") {
    graft.sources.BarsSource.transports.put("ingest-1d", new Rest.Http {
      def get(url: String, params: Map[String, String]) = {
        assert(url.contains("/range/1/day/"), url)
        Rest.HttpResponse(200, page(Seq(base), None))
      }
    })
    val df = spark.read.format("graft-bars")
      .option("symbols", "AAPL").option("baseUrl", "http://x")
      .option("start", "2024-01-01").option("end", "2024-01-02")
      .option("timespan", "day").option("transportKey", "ingest-1d")
      .option("interPageDelaySec", "0").load()
    assert(df.count() == 1)
    intercept[Exception] {
      spark.read.format("graft-bars")
        .option("symbols", "AAPL").option("baseUrl", "http://x")
        .option("start", "2024-01-01").option("end", "2024-01-02")
        .option("timespan", "hour").option("transportKey", "ingest-1d").load()
        .count()
    }
  }

  test("E1 parallel (DSv2) backfill matches the serial path's semantics") {
    val lakeDir = Files.createTempDirectory("graft-lake-par").toString + "/bars"
    graft.sources.BarsSource.transports.put("ingest-par", new Rest.Http {
      def get(url: String, params: Map[String, String]) = {
        // two symbols served from one stub; rows differ per symbol
        val off = if (url.contains("/AAPL/")) 0 else 10
        Rest.HttpResponse(200, page((off to off + 2).map(minuteMs(_)), None))
      }
    })
    val n1 = Ingest.historicalBackfillParallel(spark, "http://x",
      Seq("AAPL", "MSFT"), lakeDir, fullLoad = true,
      userWindow = Some(("2024-01-01", "2024-01-02")),
      transportKey = Some("ingest-par"), interPageDelaySec = 0)
    assert(n1 == 6)
    val lake = Lake.read(spark, lakeDir)
    assert(lake.count() == 6)
    assert(lake.select("symbol").distinct().count() == 2)
    // incremental run over the same feed: everything <= watermark drops
    val n2 = Ingest.historicalBackfillParallel(spark, "http://x",
      Seq("AAPL", "MSFT"), lakeDir, fullLoad = false,
      transportKey = Some("ingest-par"), interPageDelaySec = 0)
    assert(n2 == 0)
    // schema matches the serial path's lake (declared AGG contract)
    assert(lake.schema("volume").dataType.typeName == "long")
  }

  test("E2 session ingest: three tables, disjoint by ET session") {
    val root = Files.createTempDirectory("graft-sessions").toString
    // full day of minutes at 14:30 UTC (regular 09:30 ET) and 09:00 UTC
    // (premarket 04:00 ET) and 22:00 UTC (afterhours 17:00 ET)
    val regularTs = Seq(base + (14 * 60 + 30) * 60000L)
    val premarketTs = Seq(base + 9 * 3600000L)
    val afterhoursTs = Seq(base + 22 * 3600000L)
    val http = new Rest.Http {
      def get(url: String, params: Map[String, String]) =
        if (params.get("session").contains("regular"))
          Rest.HttpResponse(200, page(regularTs, None))
        else
          Rest.HttpResponse(200, page(regularTs ++ premarketTs ++ afterhoursTs, None))
    }
    val r = Ingest.sessionIngest(spark, http, "http://x", Seq("AAPL"), root,
      "2024-01-01", "2024-01-02", sleep = _ => ())
    assert(r("AAPL") == 3)
    assert(Lake.read(spark, s"$root/regular").count() == 1)
    assert(Lake.read(spark, s"$root/premarket").count() == 1)
    assert(Lake.read(spark, s"$root/afterhours").count() == 1)
  }

  test("A23 api key lookup: env first, then spark conf, else error") {
    assert(Ingest.apiKey(spark, Map("MASSIVE_API_KEY" -> "k1")) == "k1")
    spark.conf.set("spark.massive.api.key", "k2")
    assert(Ingest.apiKey(spark, Map.empty) == "k2")
    spark.conf.unset("spark.massive.api.key")
    intercept[IllegalStateException](Ingest.apiKey(spark, Map.empty))
  }
}
