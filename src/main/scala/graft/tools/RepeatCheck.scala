package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility (r19): run each named query TWICE in one session and
  * diff the collected results — the first-touch/ensure-cached queries'
  * repeat path (what bench reps exercise) must serve exactly what the
  * cold run served. Usage: runMain graft.tools.RepeatCheck <name...>
  * [--sf <dir>] */
object RepeatCheck {
  def main(args: Array[String]): Unit = {
    val sfIdx = args.indexOf("--sf")
    val dir = if (sfIdx >= 0) args(sfIdx + 1) else "/root/testdata/sf0.01"
    val names = args.zipWithIndex
      .filter { case (_, i) => sfIdx < 0 || (i != sfIdx && i != sfIdx + 1) }
      .map(_._1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.queries.Queries.scratchRoot + "/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries
    var bad = 0
    names.foreach { n =>
      val fn = all(n)
      def rows(): Seq[String] =
        fn(spark, dir).collect().map(_.toString).sorted.toSeq
      val (a, b) = (rows(), rows())
      if (a == b) println(s"[repeat] PASS $n (${a.size} rows)")
      else {
        bad += 1
        println(s"[repeat] FAIL $n: run1 ${a.size} rows, run2 ${b.size} rows")
        (a.diff(b) ++ b.diff(a)).take(5).foreach(r => println(s"[repeat]   $r"))
      }
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
