package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing — merge overlapping (or touching) per-key
  * intervals into maximal disjoint spans: activity sessions from
  * padded event times, validity-window compaction, downtime stitching,
  * free/busy rollups. The classic "merge overlapping intervals" primitive
  * expressed as ONE keyed window plus an exchange-free aggregation.
  *
  * Algorithm (the textbook sweep, made distributed): order each key's
  * intervals by (start, id); an interval opens a NEW span exactly when
  * its start exceeds the running maximum end over all PRECEDING
  * intervals (touching intervals — start == running max end — merge:
  * half-open semantics); the running sum of those open-flags numbers the
  * spans, and a group-by over (key, span) takes min(start)/max(end).
  *
  * Scale shape: ONE shuffle total. The window partitions by key; the
  * follow-up aggregation groups by (key, span) — HashPartitioning(key)
  * satisfies ClusteredDistribution(key, span), so it runs exchange-free
  * on the window's placement. Window state is O(1) per row (a running
  * max and a running sum, both incremental frames), so a hot key costs
  * task TIME, never task memory. Every step is integer/timestamp
  * comparison — bit-replayable in ANSI SQL.
  */
object Intervals {

  /** Merge each key's overlapping-or-touching `[startCol, endCol)`
    * intervals. `idCol` breaks ordering ties among equal starts so the
    * span numbering is deterministic. Returns one row per merged span:
    * `(keyCol, span_start, span_end, n_merged)`. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, idCol: String): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(idCol))
    val prevMax = max(col(endCol))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMax.isNull || col(startCol) > prevMax, 1L)
      .otherwise(0L)
    df.withColumn("__open", opens)
      .withColumn("__span", sum(col("__open"))
        .over(byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__span"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__span")
  }

  /** The ANSI SQL replay of [[mergeIntervals]] for a DuckDB oracle:
    * `ivSql` must produce (key, id, s, e). */
  def mergeIntervalsOracleSql(ivSql: String): String =
    s"WITH iv AS ($ivSql), " +
      "f AS (SELECT key, id, s, e, CASE WHEN " +
      "max(e) OVER (PARTITION BY key ORDER BY s, id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL " +
      "OR s > max(e) OVER (PARTITION BY key ORDER BY s, id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) " +
      "THEN 1 ELSE 0 END AS op FROM iv), " +
      "g AS (SELECT key, s, e, sum(op) OVER (PARTITION BY key " +
      "ORDER BY s, id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
      "AS span FROM f) " +
      "SELECT key, min(s) AS span_start, max(e) AS span_end, " +
      "count(*) AS n_merged FROM g GROUP BY key, span"
}
