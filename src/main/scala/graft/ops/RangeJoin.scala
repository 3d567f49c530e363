package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi+range (interval) joins, expressed as equi-joins via time banding.
  *
  * Spark has no native range-join operator: a plain
  * `l.join(r, cond && r.ts.between(...))` with a non-equi time predicate
  * plans as BroadcastNestedLoopJoin (or a cartesian product when neither
  * side fits in memory) — O(|L|·|R|) and a guaranteed 100 TB failure mode.
  *
  * Banding restores the hash path: both sides are bucketed onto a fixed
  * time grid, the probe side explodes to every bucket its window covers
  * (a small constant ≤ span/band + 1), and the range predicate becomes an
  * equi-join on (key, bucket) plus a residual filter. Shuffle volume is
  * |L|·(span/band+1) + |R| rows — linear, partitioned, AQE-skew-handled.
  * The same rewrite powers range joins in Databricks' engine and Flink's
  * interval joins.
  */
object RangeJoin {

  /** Join `right` rows to `left` rows sharing `equiKey`, where
    * `right.rightTs ∈ [left.leftTs + loMs, left.leftTs + hiMs)` — a
    * half-open interval, offsets in milliseconds (negative = look back).
    *
    * `bandMs` is the bucket width; pick it ≈ (hiMs - loMs) so the probe
    * side explodes into at most 2–3 buckets. Both ts columns must be
    * TimestampType. Column names of the two sides must be disjoint apart
    * from `equiKey`.
    */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, equiKey: String,
      leftTs: String, rightTs: String, loMs: Long, hiMs: Long,
      bandMs: Long): DataFrame = {
    require(hiMs > loMs, s"empty interval [$loMs, $hiMs)")
    require(bandMs > 0, "band width must be positive")
    // all arithmetic in microseconds — Spark timestamps are µs-precision,
    // and a millisecond-truncated residual filter would silently drop or
    // add pairs whose true bound falls inside the truncated millisecond
    val loUs = loMs * 1000L
    val hiUs = hiMs * 1000L
    val bandUs = bandMs * 1000L
    def bucketOf(tsUs: Column): Column = floor(tsUs / bandUs)
    val lUs = unix_micros(col(leftTs))
    val rUs = unix_micros(col(rightTs))
    // [lo, hi) half-open: the last covered bucket is the one holding hi-1
    val probe = left.withColumn("__bucket",
      explode(sequence(bucketOf(lUs + loUs), bucketOf(lUs + hiUs - 1))))
    val build = right.withColumn("__bucket", bucketOf(rUs))
    probe.join(build, Seq(equiKey, "__bucket"))
      .filter(rUs >= lUs + loUs && rUs < lUs + hiUs)
      .drop("__bucket")
  }
}
