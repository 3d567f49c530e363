package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.model.TradingSession

/** The reference's per-bar transforms as pure `DataFrame => DataFrame`
  * functions. Each cites the behavior it reproduces
  * (file:line relative to /root/reference).
  *
  * All of these stay inside Catalyst expressions (whole-stage codegen, no
  * UDFs), so filter/projection pushdown and partition pruning keep working
  * at 100 TB — the sessionization predicate over derived `hhmm` is the only
  * one that cannot push to parquet, which matches the reference semantics.
  */
object BarOps {

  /** A8+A9+A10: tag constant symbol, epoch-ms → timestamp, rename to long
    * names. Reference: `symbols(historical)/ingest_massive.py:124-138`,
    * `1m-seesion-pipeline/ingest_1m_session.py:242-256`.
    *
    * The reference computes `(t/1000).cast("timestamp")` which round-trips
    * through Double seconds; `timestamp_millis` is the exact-integer
    * equivalent. `compatDoubleCast = true` reproduces the reference's Double
    * path bit-for-bit.
    */
  def normalizeRaw(raw: DataFrame, symbol: String,
      compatDoubleCast: Boolean = false): DataFrame =
    normalizeTagged(raw.withColumn("symbol", lit(symbol)), compatDoubleCast)

  /** [[normalizeRaw]] for pre-tagged wire rows (the DSv2 source emits the
    * symbol column itself): same rename/cast pipeline, symbol kept. */
  def normalizeTagged(raw: DataFrame,
      compatDoubleCast: Boolean = false): DataFrame = {
    val ts =
      if (compatDoubleCast) (col("t") / 1000).cast("timestamp")
      else timestamp_millis(col("t"))
    raw
      .withColumn("ts", ts)
      .select(col("ts"), col("symbol"),
        col("o").as("open"), col("h").as("high"), col("l").as("low"),
        col("c").as("close"),
        col("v").cast("long").as("volume"),     // enforce declared AGG_SCHEMA
        col("vw").as("vwap"),
        col("n").cast("long").as("trades"))
  }

  /** A11+A12: ET event-time columns. Reference: `1m-seesion-pipeline/utils.py:3-5`. */
  def withEastern(df: DataFrame, tsCol: String = "ts"): DataFrame = {
    val et = from_utc_timestamp(col(tsCol), "America/New_York")
    df.withColumn("ts_et", et)
      .withColumn("hhmm", hour(col("ts_et")) * 100 + minute(col("ts_et")))
  }

  /** A13: inclusive hhmm-range session predicate. Unknown session names pass
    * rows through unfiltered, exactly like the reference fallthrough
    * (`1m-seesion-pipeline/utils.py:19`). */
  def filterSession(df: DataFrame, session: String): DataFrame = {
    val withCols = if (df.columns.contains("hhmm")) df else withEastern(df)
    TradingSession.forName(session) match {
      case Some(s) => withCols.filter(col("hhmm") >= s.lo && col("hhmm") <= s.hi)
      case None    => withCols
    }
  }

  /** Column form of the session classifier (single-pass alternative to three
    * filtered scans; at scale one pass + partition-by-session write beats the
    * reference's 3× scan). */
  def sessionColumn(hhmm: Column): Column =
    TradingSession.all.foldLeft(lit(null).cast("string")) { (acc, s) =>
      when(hhmm >= s.lo && hhmm <= s.hi, lit(s.name)).otherwise(acc)
    }

  /** A15 (+E3): lake high-water mark — `select max(ts)` collapses to a
    * 2-phase HashAggregate reading only the `ts` column. Reference:
    * `symbols(historical)/utils.py:13-19`. */
  def maxTs(df: DataFrame, tsCol: String = "ts"): Option[Timestamp] =
    df.agg(max(col(tsCol)).as("max_ts")).head() match {
      case r if r.isNullAt(0) => None
      case r                  => Some(r.getTimestamp(0))
    }

  /** A14: strict watermark filter — the incremental-load dedup for the 1-day
    * overlap re-fetch. Reference: `symbols(historical)/ingest_massive.py:140-141`. */
  def newerThan(df: DataFrame, watermark: Timestamp, tsCol: String = "ts"): DataFrame =
    df.filter(col(tsCol) > lit(watermark))

  /** Deterministic aggregation-order-independent sum: exact decimal
    * accumulation, surfaced as Double. Used by every declared query so
    * result hashes are stable across partitionings (and match the DuckDB
    * oracle, which gets the same decimal cast). */
  def moneySum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** [[moneySum]] fast path: accumulates the decimal's UNSCALED value
    * (micros) as plain longs — the rewrite Catalyst's DecimalAggregates
    * rule applies automatically only at low precision — and re-attaches
    * scale 6 once per group. Bit-identical to [[moneySum]] (same rounding
    * cast, same integer total, same final double), measured ~2× cheaper
    * per row (no per-row Decimal allocation / overflow check).
    *
    * PRECONDITION: the per-group total must fit the long micros domain,
    * |Σ x| < 2⁶³/10⁶ ≈ 9.2·10¹² — guaranteed for bounded groups (per
    * order / customer / symbol-hour …) at any corpus size. For UNBOUNDED
    * groups (grand totals, rollup ALL buckets) stay on [[moneySum]]: at
    * 100 TB a global money total can breach the long domain. The long
    * accumulation is `try_sum`, so a violated precondition surfaces as a
    * NULL total (visible in any result diff) instead of a silently
    * wrapped value. */
  def moneySumFast(c: Column): Column = {
    // idempotent self-registration: standalone callers don't necessarily
    // go through Queries.table/resampleOhlcv, which also register
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.CatalystExpressions.register)
    val unscaled = call_function("graft_unscaled", c.cast(DecimalType(18, 6)))
    call_function("graft_make_decimal_38_6", try_sum(unscaled)).cast(DoubleType)
  }

  /** D6: OHLCV resample — first/last made deterministic with
    * `min_by`/`max_by` over (ts, tieCol) struct ordering (Spark's plain
    * `first`/`last` aggregates are order-dependent). One shuffle on
    * (key, bucket); partial aggregation is map-side. */
  def resampleOhlcv(df: DataFrame, key: Column, ts: Column, value: Column,
      tieBreak: Column, bucket: String = "hour"): DataFrame = {
    graft.functions.CatalystExpressions.register(df.sparkSession)
    val ord = struct(ts, tieBreak)
    df.groupBy(key, date_trunc(bucket, ts).as("bucket"))
      .agg(
        min_by(value, ord).as("open"),
        max(value).as("high"),
        min(value).as("low"),
        max_by(value, ord).as("close"),
        // (key, bucket) groups are bounded, so the unscaled-long fast
        // path's precondition holds at any corpus size
        moneySumFast(value).as("volume"),
        count(lit(1)).as("n"))
  }

  /** D11-style per-key analytics: row_number / lag-delta / rank over an
    * explicit total order (ts, tieCol) so results are deterministic. */
  def withReturns(df: DataFrame, key: Column, ts: Column, value: Column,
      tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
    df.withColumn("rn", row_number().over(w))
      .withColumn("delta", value - lag(value, 1).over(w))
  }
}
