package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: measure base-table scan parallelism at a given SF dir.
  *
  * The driver's test parquet is written as ONE row group per table
  * (pyarrow default at these sizes), and a parquet scan task produces
  * rows only for the row groups whose midpoint falls in its byte split —
  * so every base-table scan stage here runs as a single task no matter
  * how low `spark.sql.files.maxPartitionBytes` goes. That is the floor
  * under the q08/q10/q13-style gaps vs DuckDB (which parallelizes WITHIN
  * a row group): the first stage of each of those queries is a
  * one-thread decode+join+partial-agg of the whole table. At production
  * scale a table is thousands of files × row groups and the same plans
  * scan wide; repartition()-ing after the scan at test scale would add a
  * full-table shuffle that is pure overhead in the real regime, so the
  * declared queries deliberately do NOT do it (see NOTES.md).
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("lineitem", "orders", "events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      val parts = df.rdd.getNumPartitions
      val nonEmpty = df.rdd.mapPartitions(it => Iterator.single(if (it.hasNext) 1 else 0))
        .collect().sum
      // decode throughput of the single-threaded scan: count() with a
      // non-trivial projection so the column actually decodes
      val cols = df.columns.take(3).map(col)
      val t0 = System.nanoTime()
      df.select(cols: _*).filter(cols.head.isNotNull).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scanprobe] $t%-12s splits=$parts%3d non_empty=$nonEmpty%3d " +
        f"scan+count=${sec}%6.3f s")
    }
    spark.stop()
  }
}
