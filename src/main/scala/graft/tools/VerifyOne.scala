package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev utility: Verify for a SUBSET of queries — dump each named query's
  * result + its oracle SQL so tools/check_oracle.py can gate just the
  * queries under work, without paying a full 70-query Verify pass.
  * Usage: runMain graft.tools.VerifyOne <outDir> <name...> [--sf <dir>] */
object VerifyOne {
  private def usage(msg: String): Nothing = {
    System.err.println(s"VerifyOne: $msg")
    System.err.println("usage: runMain graft.tools.VerifyOne <outDir> <queryName...> [--sf <dir>]")
    sys.exit(2)
  }

  def main(args: Array[String]): Unit = {
    val sfIdx = args.indexOf("--sf")
    if (sfIdx >= 0 && sfIdx + 1 >= args.length) usage("--sf needs a directory")
    val dir = if (sfIdx >= 0) args(sfIdx + 1) else "/root/testdata/sf0.01"
    val rest = args.zipWithIndex
      .filter { case (_, i) => sfIdx < 0 || (i != sfIdx && i != sfIdx + 1) }
      .map(_._1)
    if (rest.length < 2) usage("need an output dir and at least one query name")
    val outDir = rest.head
    val names = rest.tail
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    if (unknown.nonEmpty) usage(s"unknown queries: ${unknown.mkString(", ")}")
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
    new java.io.File(outDir).mkdirs()
    val all = graft.SparkEntry.queries
    names.foreach { n =>
      try {
        all(n)(spark, dir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
        println(s"[verify1] $n dumped")
      } catch { case e: Throwable =>
        System.err.println(s"[verify1] $n FAILED: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .filter { case (k, _) => names.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
