package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: diff ewma vs ewmaSegmented on the real events table to
  * localize any divergence (temporary diagnostic, driven by hand). */
object EwmaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ev = graft.queries.Queries.normalizeTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val whole = graft.ops.TimeSeries.ewma(ev, "user_id", "ts", "event_id",
      "value", 20).as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val seg = graft.ops.TimeSeries.ewmaSegmented(ev, "user_id", "ts",
        "event_id", "value", 20, to_date($"ts"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    println(s"[probe] whole=${whole.length} seg=${seg.length}")
    val w = whole.map(r => (r._1, r._2) -> r._3).toMap
    val s2 = seg.map(r => (r._1, r._2) -> r._3).toMap
    val onlyW = whole.filter(r => !s2.contains((r._1, r._2))).take(5)
    val onlyS = seg.filter(r => !w.contains((r._1, r._2))).take(5)
    println(s"[probe] onlyWhole=${onlyW.mkString(",")}")
    println(s"[probe] onlySeg=${onlyS.mkString(",")}")
    val diffs = whole.filter(r => s2.get((r._1, r._2)).exists(_ != r._3))
    println(s"[probe] valueDiffs=${diffs.length}")
    diffs.take(10).foreach { r =>
      println(s"[probe] key=${r._1} id=${r._2} whole=${r._3} seg=${s2((r._1, r._2))}")
    }
    // context for the first diverging key: its rows in ts order
    diffs.headOption.foreach { r =>
      ev.filter(col("user_id") === r._1)
        .select(col("ts"), col("event_id"), col("value"), to_date(col("ts")).as("d"))
        .orderBy("ts", "event_id").show(50, truncate = false)
    }
    spark.stop()
  }
}
