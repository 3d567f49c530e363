package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: per-batch watermark trace for the q65 outer-join staging
  * (kept as the measurement behind the sentinel-batch design — it caught
  * the filter-pushed-below-watermark drop of the original sentinels). */
object Q65Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = graft.queries.Queries.stagedEventStreamSentinels(spark, dir, "q65probe")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("pts"), col("event_type"))
      .withWatermark("pts", "1 day")
      .filter(col("event_type") === "purchase")
      .drop("event_type")
    val c = graft.queries.Queries.stagedEventStreamSentinels(spark, dir, "q65probe")
      .select(col("user_id").as("c_user"), col("ts").as("cts"),
        col("value").as("cval"), col("event_type"))
      .withWatermark("cts", "1 day")
      .filter(col("event_type") === "click")
      .drop("event_type")
    val joined = p.join(c, expr(
      "user_id = c_user AND cts >= pts - INTERVAL 1 HOUR AND cts < pts"),
      "left_outer")
    val sq = joined.writeStream.outputMode("append").format("memory")
      .queryName("q65probe").start()
    sq.processAllAvailable()
    sq.recentProgress.foreach { pr =>
      println(s"[q65probe] batch=${pr.batchId} rows=${pr.numInputRows} " +
        s"watermark=${pr.eventTime.get("watermark")} " +
        s"max=${pr.eventTime.get("max")}")
    }
    sq.stop()
    val out = spark.table("q65probe").filter(col("user_id") >= 0)
    println(s"[q65probe] purchase_ids: ${out.select("purchase_id").distinct().count()}")
    spark.stop()
  }
}
