package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev utility (VERDICT r16 #5): A/B the q179 session-trigram
  * formulations — explicit sessionize (lag + running session-id sum +
  * per-session lead window, the r12–r16 shipped path) vs the local-gap
  * rewrite (four leads over ONE user window; a consecutive triple is
  * in-session iff both adjacent gaps are ≤ 30 min). Interleaved min-of-5
  * (the Q190Probe convention) so slow-phase drift hits both arms. */
object Q179Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Queries.table

    val wu = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

    def oldForm = {
      val g = table(spark, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wu))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("new_sess")).over(
          wu.rowsBetween(Window.unboundedPreceding, 0)))
      val ws = Window.partitionBy(col("user_id"), col("sid"))
        .orderBy(col("ts"), col("event_id"))
      g.withColumn("e2", lead(col("event_type"), 1).over(ws))
        .withColumn("e3", lead(col("event_type"), 2).over(ws))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(10)
    }

    def newForm = table(spark, dir, "events")
      .withColumn("t0", unix_micros(col("ts")))
      .withColumn("e2", lead(col("event_type"), 1).over(wu))
      .withColumn("t1", lead(col("t0"), 1).over(wu))
      .withColumn("e3", lead(col("event_type"), 2).over(wu))
      .withColumn("t2", lead(col("t0"), 2).over(wu))
      .filter(col("e3").isNotNull &&
        !(col("t1") - col("t0") > 1800000000L) &&
        !(col("t2") - col("t1") > 1800000000L))
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(10)

    // equality first — the rewrite must be a pure plan change
    val a = oldForm.collect().toSeq
    val b = newForm.collect().toSeq
    require(a.map(_.toSeq) == b.map(_.toSeq), "formulations disagree")

    var tOld = Double.MaxValue; var tNew = Double.MaxValue
    for (_ <- 1 to 5) {
      val t0 = System.nanoTime(); oldForm.count()
      tOld = math.min(tOld, (System.nanoTime() - t0) / 1e9)
      val t1 = System.nanoTime(); newForm.count()
      tNew = math.min(tNew, (System.nanoTime() - t1) / 1e9)
    }
    println(f"[q179] sessionize form $tOld%7.3f s")
    println(f"[q179] local-gap  form $tNew%7.3f s")
    println("[q179] old plan:\n" + oldForm.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Exchange") || l.contains("Sort")
        || l.contains("Window")).mkString("\n"))
    println("[q179] new plan:\n" + newForm.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Exchange") || l.contains("Sort")
        || l.contains("Window")).mkString("\n"))
    spark.stop()
  }
}
