package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans for the declared queries so
  * scan pruning / pushdown / join strategies can be audited. */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.queries.Queries.all
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
    qs.toSeq.sortBy(_._1).foreach { case (name, q) =>
      println(s"\n========== $name ==========")
      try q.fn(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
    }
    spark.stop()
  }
}
