package graft.io

import scala.annotation.tailrec
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** REST extract layer: the reference's Polygon/Massive clients re-expressed
  * behind a pluggable transport so the logic is testable offline.
  *
  * Ports (file:line relative to /root/reference):
  *  - retry/backoff: `symbols(historical)/polygon_client.py:19-53` —
  *    5 attempts, 2s base, ×2 exponential; HTTP 429 honors Retry-After;
  *    ≥500 and transport errors retry; other 4xx fail fast
  *  - aggregate pagination: `1m-seesion-pipeline/massive_client.py:30-60` —
  *    cursor/next_url loop, limit=50000, adjusted=true, sort=asc, optional
  *    server-side session filter, fixed inter-page delay (12s)
  *  - ticker universe: `symbols(historical)/ingest_massive.py:23-70` —
  *    CS then PFD, active then delisted, limit=1000, cursor parsed from
  *    next_url's query string
  */
object Rest {

  final case class HttpResponse(status: Int, body: String,
      headers: Map[String, String] = Map.empty)

  /** Transport boundary: real deployments use java.net.http with a 30s
    * timeout (polygon_client.py:29); tests plug in a stub. */
  trait Http {
    def get(url: String, params: Map[String, String]): HttpResponse
  }

  final class JavaHttp(apiKeyHeader: Map[String, String] = Map.empty) extends Http {
    private val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30)).build()
    def get(url: String, params: Map[String, String]): HttpResponse = {
      val qs = params.map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      val full = if (qs.isEmpty) url else s"$url${if (url.contains("?")) "&" else "?"}$qs"
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(full))
        .timeout(java.time.Duration.ofSeconds(30))
      apiKeyHeader.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      HttpResponse(resp.statusCode(), resp.body(),
        resp.headers().map().asScala.map { case (k, v) => k -> v.asScala.mkString(",") }.toMap)
    }
  }

  final case class RetryPolicy(maxRetries: Int = 5, baseWaitSec: Double = 2.0,
      backoffFactor: Double = 2.0)

  /** A5: retrying GET. `sleep` is injectable so tests run instantly. */
  final class RetryingHttp(inner: Http, policy: RetryPolicy = RetryPolicy(),
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong)) extends Http {

    def get(url: String, params: Map[String, String]): HttpResponse = {
      @tailrec def attempt(n: Int): HttpResponse = {
        val result =
          try Right(inner.get(url, params))
          catch { case e: Exception => Left(e) }
        result match {
          case Right(r) if r.status == 429 && n < policy.maxRetries =>
            // honor Retry-After when present (case-insensitive: HTTP/2
            // transports deliver lowercase header names), else backoff
            val wait = r.headers.collectFirst {
                case (k, v) if k.equalsIgnoreCase("Retry-After") => v
              }.flatMap(_.toDoubleOption)
              .getOrElse(policy.baseWaitSec * math.pow(policy.backoffFactor, n))
            sleep(wait); attempt(n + 1)
          case Right(r) if r.status >= 500 && n < policy.maxRetries =>
            sleep(policy.baseWaitSec * math.pow(policy.backoffFactor, n)); attempt(n + 1)
          case Right(r) if r.status >= 400 && r.status < 500 && r.status != 429 =>
            throw new RuntimeException(s"HTTP ${r.status} for $url (fail fast)")
          case Right(r) if r.status >= 500 || r.status == 429 =>
            throw new RuntimeException(s"HTTP ${r.status} for $url after ${policy.maxRetries} retries")
          case Right(r) => r
          case Left(e) if n < policy.maxRetries =>
            sleep(policy.baseWaitSec * math.pow(policy.backoffFactor, n)); attempt(n + 1)
          case Left(e) => throw e
        }
      }
      attempt(0)
    }
  }

  private val mapper = new ObjectMapper()

  /** A4: paginated aggregate-bars extract. Returns raw wire rows
    * (t,o,h,l,c,v,vw,n) as a list of JsonNodes for the typed decode step.
    * `timespan` selects the bar granularity path segment — `minute` (1m)
    * or `day` (1d), the two the reference supports
    * (polygon_client.py:57-69; anything else raised ValueError there). */
  def fetchAggregates(http: Http, baseUrl: String, symbol: String,
      start: String, end: String, session: Option[String] = None,
      timespan: String = "minute",
      pageLimit: Int = 50000, interPageDelaySec: Double = 12.0,
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong)): Seq[JsonNode] = {
    require(timespan == "minute" || timespan == "day",
      s"Unsupported timespan: $timespan (expected 'minute' or 'day')")
    val first = s"$baseUrl/v2/aggs/ticker/$symbol/range/1/$timespan/$start/$end"
    val baseParams = Map("adjusted" -> "true", "sort" -> "asc",
      "limit" -> pageLimit.toString) ++ session.map("session" -> _)
    val out = Seq.newBuilder[JsonNode]
    var url = first
    var params = baseParams
    var done = false
    while (!done) {
      val resp = http.get(url, params)
      val root = mapper.readTree(resp.body)
      val results = root.path("results")
      if (results.isArray) results.elements().asScala.foreach(out += _)
      val next = root.path("next_url")
      if (next.isTextual && next.asText.nonEmpty) {
        url = next.asText
        params = Map.empty // cursor URL carries its own params
        sleep(interPageDelaySec)
      } else done = true
    }
    out.result()
  }

  /** A6: ticker universe — CS then PFD, active then delisted, in that fixed
    * order, cursor-paginated at 1000/page. */
  def fetchTickerUniverse(http: Http, baseUrl: String,
      pageLimit: Int = 1000,
      sleep: Double => Unit = _ => ()): Seq[String] = {
    def fetchGroup(tpe: String, active: Boolean): Seq[String] = {
      val out = Seq.newBuilder[String]
      var cursor: Option[String] = None
      var done = false
      while (!done) {
        val params = Map("market" -> "stocks", "locale" -> "us", "type" -> tpe,
          "active" -> active.toString, "limit" -> pageLimit.toString) ++
          cursor.map("cursor" -> _)
        val root = mapper.readTree(http.get(s"$baseUrl/v3/reference/tickers", params).body)
        root.path("results").elements().asScala
          .foreach(n => out += n.path("ticker").asText)
        val next = root.path("next_url")
        cursor = if (next.isTextual && next.asText.contains("cursor=")) {
          // reference parses the cursor out of next_url's query string
          Some(next.asText.split("cursor=")(1).split("&")(0))
        } else None
        done = cursor.isEmpty
        if (!done) sleep(12.0)
      }
      out.result()
    }
    fetchGroup("CS", active = true) ++ fetchGroup("CS", active = false) ++
      fetchGroup("PFD", active = true) ++ fetchGroup("PFD", active = false)
  }

  /** A7: wire JSON -> RawBar with None-passthrough type coercion
    * (polygon_client.py:100-119 "so Spark doesn't explode on type mismatch";
    * here the coercion is a typed decode instead of dynamic casts). */
  def decodeRaw(rows: Seq[JsonNode]): Seq[graft.model.RawBar] = rows.map { n =>
    def d(f: String): Option[Double] =
      Option(n.get(f)).filter(_.isNumber).map(_.asDouble)
    graft.model.RawBar(
      t = Option(n.get("t")).filter(_.isNumber).map(_.asLong),
      o = d("o"), h = d("h"), l = d("l"), c = d("c"),
      v = d("v"), vw = d("vw"), n = d("n"))
  }
}
