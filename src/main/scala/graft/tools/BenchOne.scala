package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual declared queries (median of 5 after one
  * warm-up) — the per-query feedback loop for plan work, without paying a
  * full Bench pass. Usage: runMain graft.tools.BenchOne q23_dedup_embedding
  * [more names...] [--sf <dir>] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfIdx = args.indexOf("--sf")
    val dir = if (sfIdx >= 0) args(sfIdx + 1) else "/root/testdata/sf0.1"
    val names = args.zipWithIndex
      .filter { case (_, i) => sfIdx < 0 || (i != sfIdx && i != sfIdx + 1) }
      .map(_._1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.queries.Queries.scratchRoot + "/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries
    names.foreach { n =>
      val fn = all(n)
      fn(spark, dir).count() // warm
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[bench1] $n%-28s median ${ts(2)}%6.3f s  (min ${ts.head}%6.3f, max ${ts.last}%6.3f)")
    }
    spark.stop()
  }
}
