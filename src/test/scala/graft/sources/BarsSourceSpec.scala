package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.io.Rest

class BarsSourceSpec extends AnyFunSuite with SparkTest {

  /** Paginated stub feed: every symbol serves 2 pages of 2 bars each,
    * values derived from the symbol so rows are attributable. */
  private object StubFeed extends Rest.Http {
    def get(url: String, params: Map[String, String]): Rest.HttpResponse = {
      val sym = url.split("/ticker/")(1).split("/")(0)
      val base = sym.hashCode.abs % 1000
      def bar(i: Int) =
        s"""{"t": ${1700000000000L + i * 60000L}, "o": $base.0, "h": ${base + i}.5,
           | "l": $base.0, "c": ${base + i}.25, "v": 100.0, "vw": $base.1, "n": 7.0}"""
          .stripMargin
      if (url.contains("page=2"))
        Rest.HttpResponse(200, s"""{"results": [${bar(2)}, ${bar(3)}]}""")
      else
        Rest.HttpResponse(200,
          s"""{"results": [${bar(0)}, ${bar(1)}], "next_url": "$url/page=2"}""")
    }
  }

  test("graft-bars reads one partition per symbol, paginated, typed") {
    BarsSource.transports.put("stub", StubFeed)
    val df = spark.read.format("graft-bars")
      .option("symbols", "AAPL, MSFT ,GOOG")
      .option("baseUrl", "http://feed").option("start", "2024-01-01")
      .option("end", "2024-01-02").option("transportKey", "stub")
      .option("interPageDelaySec", "0")
      .load()

    assert(df.schema == BarsSource.schema)
    assert(df.rdd.getNumPartitions == 3, "one InputPartition per symbol")
    assert(df.count() == 12, "3 symbols x 2 pages x 2 bars")
    val perSym = df.groupBy("symbol").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSym == Map("AAPL" -> 4L, "MSFT" -> 4L, "GOOG" -> 4L))
    // rows are typed RAW wire rows, ready for the normalize pipeline
    val t0 = df.filter(col("symbol") === "AAPL").agg(min("t")).head.getLong(0)
    assert(t0 == 1700000000000L)
  }

  test("column pruning still yields correct projected reads") {
    BarsSource.transports.put("stub", StubFeed)
    val df = spark.read.format("graft-bars")
      .option("symbols", "AAPL").option("baseUrl", "http://feed")
      .option("start", "2024-01-01").option("end", "2024-01-02")
      .option("transportKey", "stub").option("interPageDelaySec", "0")
      .load().select("symbol", "c")
    assert(df.collect().forall(_.length == 2))
  }
}
