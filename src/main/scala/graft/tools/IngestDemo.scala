package graft.tools

import org.apache.spark.sql.SparkSession

import graft.io.{Lake, Rest}
import graft.pipeline.Ingest

/** Sample driver for the ingest pipelines against a canned transport —
  * the offline stand-in for `spark-submit`-ing the backfill against a live
  * API (run manually; not part of the driver contract). */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = 1704067200000L // 2024-01-01 UTC
    def body(ts: Seq[Long]) = ts.map(t =>
      s"""{"t":$t,"o":1.0,"h":2.0,"l":0.5,"c":1.5,"v":100.0,"vw":1.2,"n":3.0}""")
      .mkString("""{"results":[""", ",", "]}")
    val http = new Rest.Http {
      def get(url: String, params: Map[String, String]) =
        Rest.HttpResponse(200, body((0 until 5).map(i => base + i * 60000L)))
    }

    val lake = java.nio.file.Files.createTempDirectory("ingest-demo").toString + "/bars"
    val full = Ingest.historicalBackfill(spark, http, "http://api", Seq("AAPL", "MSFT"),
      lake, fullLoad = true, userWindow = Some(("2024-01-01", "2024-01-02")),
      sleep = _ => ())
    println(s"[demo] full load appended: $full")
    val incr = Ingest.historicalBackfill(spark, http, "http://api", Seq("AAPL", "MSFT"),
      lake, fullLoad = false, sleep = _ => ())
    println(s"[demo] incremental (full overlap) appended: $incr")
    val df = Lake.read(spark, lake)
    println(s"[demo] lake rows: ${df.count()} distinct(symbol,ts): " +
      df.select("symbol", "ts").distinct().count())
    df.orderBy("symbol", "ts").show(4, truncate = false)
    spark.stop()
  }
}
