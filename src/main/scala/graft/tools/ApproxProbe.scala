package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: probe the exact-regime behavior of the built-in sketches
  * against ground truth at each SF — HLL++ distinct estimates at max
  * precision and percentile_approx's rank convention at high accuracy —
  * before committing oracle SQL for q52/q53. */
object ApproxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val ev = graft.queries.Queries.table(spark, dir, "events")
      Seq(0.005, 0.01, 0.02).foreach { rsd =>
        val r = ev.groupBy(col("event_type"))
          .agg(approx_count_distinct(col("user_id"), rsd).as("a"),
            countDistinct(col("user_id")).as("e"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        val bad = r.filter(t => t._2 != t._3)
        println(s"[probe] $sf hll rsd=$rsd " +
          (if (bad.isEmpty) s"EXACT (${r.head._3})" else s"MISMATCH: ${bad.mkString(",")}"))
      }
      val li = graft.queries.Queries.table(spark, dir, "lineitem")
      val p = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000000)).as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000000)).as("p95"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      p.foreach { case (f, p50, p95, n) =>
        // which 1-indexed ranks do these values sit at?
        val vals = li.filter(col("l_returnflag") === f)
          .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
        val r50 = vals.indexOf(p50) + 1
        val r95 = vals.indexOf(p95) + 1
        println(f"[probe] $sf pct flag=$f n=$n p50 rank=$r50 (ceil(pn)=${math.ceil(0.5 * n).toLong}, floor(pn)+1=${0.5 * n + 1}) " +
          f"p95 rank=$r95 (ceil(pn)=${math.ceil(0.95 * n).toLong})")
      }
    }
    spark.stop()
  }
}
