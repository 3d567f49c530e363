package graft.io

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned columnar lake reader/writer, reproducing the reference's
  * storage semantics (SURVEY.md §1.1):
  *  - Hive-style `symbol=` partition dirs, append mode
  *    (`symbols(historical)/ingest_massive.py:155`,
  *    `1m-seesion-pipeline/ingest_1m_session.py:273-293`)
  *  - `format ∈ {parquet, delta}` switch; `delta` is used verbatim when
  *    the Delta jars are on the classpath (probed at first use) and
  *    routes to parquet otherwise, with the append+partitionBy semantics
  *    preserved (the reference uses no Delta-only feature beyond
  *    `format("delta")` — SURVEY.md §7).
  *
  * Unlike the reference (explicit "NO coalesce" comment,
  * `ingest_massive.py:153`), the writer exposes `maxRecordsPerFile` so a
  * 1000-executor append does not produce a small-files lake.
  */
object Lake {

  /** A2: parquet scan with schema + partition discovery. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** A3: existence probe. The reference wraps `read.parquet(...).limit(1)`
    * in try/except — the eager part is footer/schema resolution, which is
    * what `Try` captures here. */
  def exists(spark: SparkSession, path: String): Boolean =
    Try(spark.read.parquet(path).schema).isSuccess

  /** True iff Delta Lake's DataSource is loadable from `cl` — the
    * classpath probe behind the `delta` format switch. Probed once
    * (lazy) for the library's own classloader. */
  private[io] lazy val deltaOnClasspath: Boolean = deltaProbe(getClass.getClassLoader)

  private[io] def deltaProbe(cl: ClassLoader): Boolean =
    try {
      Class.forName("org.apache.spark.sql.delta.sources.DeltaDataSource",
        false, cl)
      true
    } catch { case _: ClassNotFoundException => false }

  /** `delta` is honored when the Delta jars are actually present and
    * falls back to parquet (append+partitionBy semantics preserved —
    * everything the reference's delta writes rely on) when they are not,
    * so the same pipeline code runs in both environments. */
  private[io] def resolveFormat(format: String,
      deltaAvailable: Boolean = deltaOnClasspath): String = format match {
    case "delta" if !deltaAvailable => "parquet"
    case other                      => other
  }

  /** A20/A21: partitioned append.
    *
    * `sortCols` orders rows *within* each task before writing (no extra
    * shuffle): every parquet row group then carries tight min/max stats
    * on those columns, so later predicate scans (the watermark `ts >`
    * probe, session time ranges) skip whole row groups at the footer —
    * the poor-man's z-order that makes a 100 TB lake scannable. */
  def append(df: DataFrame, path: String, partitionCols: Seq[String],
      format: String = "parquet", maxRecordsPerFile: Long = 0L,
      sortCols: Seq[String] = Nil): Unit = {
    val fmt = resolveFormat(format)
    val src = if (sortCols.nonEmpty)
      df.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
    else df
    var w = src.write.mode("append").format(fmt)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    w.save(path)
  }

  /** Overwrite variant used by tests and the round-trip query. */
  def overwrite(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.save(path)
  }

  /** Bucketed catalog table: rows are hash-clustered into `buckets` files
    * per partition by `bucketCol`, and the layout is recorded in the
    * catalog. Two tables bucketed the same way join with NO exchange on
    * either side — the join becomes a per-bucket zip, the co-location
    * strategy for repeated large⋈large joins (e.g. a bars table and a
    * corporate-actions table both bucketed by symbol). Requires
    * `saveAsTable` (bucket metadata lives in the catalog, not the files);
    * `spark.sql.warehouse.dir` controls placement.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      buckets: Int, sortCol: Option[String] = None): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.foreach(c => w = w.sortBy(c))
    w.saveAsTable(tableName)
  }
}
