package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — change-data-capture between two versions of a keyed
  * table: which rows were inserted, deleted, or updated, and for updates
  * WHICH columns changed. The reconciliation primitive behind
  * incremental replication, audit trails, and lake-to-lake sync: at
  * 100 TB you never re-ship a snapshot, you ship its diff.
  *
  * Scale shape: ONE full-outer equi-join on the key — both sides shuffle
  * once on the same key (co-located if both snapshots are bucketed by
  * it, see Lake.writeBucketed), comparisons are per-row projections.
  * Unchanged rows are dropped before anything wide happens, so the
  * output is |changes|, not |snapshot|. No window, no skew exposure
  * beyond the key's own distribution.
  */
object Cdc {

  /** Diff `after` against `before` on `keyCols`.
    *
    * Returns one row per changed key:
    * `key…, change ('insert'|'delete'|'update'), changed_cols` (sorted
    * array of compared column names whose values differ; null-safe —
    * NULL→value and value→NULL both count; empty only for
    * inserts/deletes, where there is no counterpart row).
    *
    * Key uniqueness per snapshot is the caller's contract (same as
    * Lake.mergeInto): a duplicated key would cross-join inside the
    * diff. */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty, "snapshotDiff needs columns to compare")
    val b = before.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_b", lit(true))
    val a = after.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_a", lit(true))
    // disambiguate compared columns by renaming the before side; keys
    // merge via the USING-style Seq join
    val bR = compareCols.foldLeft(b)((d, c) => d.withColumnRenamed(c, "__b_" + c))
    val joined = bR.join(a, keyCols, "full_outer")
    val diffs = compareCols.map(c => (c, !(col("__b_" + c) <=> col(c))))
    val changedArr = array_sort(filter(
      array(diffs.map { case (c, d) => when(d, lit(c)) }: _*),
      x => x.isNotNull))
    joined
      .withColumn("change",
        when(col("__in_b").isNull, lit("insert"))
          .when(col("__in_a").isNull, lit("delete"))
          .when(diffs.map(_._2).reduce(_ || _), lit("update")))
      .filter(col("change").isNotNull)
      .withColumn("changed_cols",
        when(col("change") === "update", changedArr)
          .otherwise(array().cast("array<string>")))
      .select((keyCols.map(col) :+ col("change") :+ col("changed_cols")): _*)
  }
}
