package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real surface lives in graft.queries.Queries (relational D1–D19) and
  * graft.queries.TrainingDataQueries (dedup/similarity/text/multimodal).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the TPC-H Q3-shape join (D8). */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q08_join3_topk").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose signatures are not
    * SQL-replayable (driver records a rows-only check for those). */
  def oracleSql: Map[String, String] =
    Queries.all.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }
}
