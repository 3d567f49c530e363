package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-call session setup for SQL-first users of the library: register
  * every graft Catalyst function and expose a parquet dataset directory
  * as temp views (with the same `ts` normalization every engine entry
  * point applies), so `spark.sql("SELECT graft_simhash60(...) FROM
  * documents ...")` works with zero DataFrame code.
  *
  * This is the interactive complement of the deployment-grade
  * `spark.sql.extensions=graft.functions.GraftExtensions` route (which
  * registers the functions in EVERY session at startup, including ones
  * the driver owns); `attach` is per-session and additionally wires the
  * data views. */
object Catalog {

  /** The table names [[attach]] looks for under a dataset directory. */
  val Tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register all graft functions, and a temp view per `<dir>/<t>.parquet`
    * that exists (missing tables are skipped, so partial datasets work).
    * Returns the view names registered. */
  def attach(spark: SparkSession, dir: String): Seq[String] = {
    graft.functions.CatalystExpressions.register(spark)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Tables.filter { t =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
      val present = fs.exists(p)
      if (present) table(spark, dir, t).createOrReplaceTempView(t)
      present
    }
  }

  /** A single normalized table (the same read path every declared query
    * uses — `ts` arrives session-zoned whichever parquet encoding the
    * dataset generation used). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.queries.Queries.table(spark, dir, name)
}
