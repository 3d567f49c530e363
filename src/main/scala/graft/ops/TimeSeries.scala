package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recurrent time-series features — operators whose row t depends on row
  * t-1's OUTPUT, which no window frame expresses (a frame sees inputs,
  * not prior outputs). Kept in fixed-point integer arithmetic so the
  * recurrence is bit-reproducible and exactly replayable in ANSI SQL
  * (a recursive CTE), the same determinism contract as [[Graph]].
  */
object TimeSeries {

  val SCALE: Long = 1000000L

  /** Input doubles → fixed-point units on a 1e-6 grid. `floor(x·1e6+0.5)`
    * rather than round(): floor on a double is exact and identical in
    * every engine, while round()'s tie behavior differs across engines. */
  def toUnits(c: Column): Column =
    floor(c * SCALE + lit(0.5)).cast("long")

  /** Per-key OLS trend over observation order — the classic "is this
    * metric drifting and how fast" fit (error-rate creep, latency
    * regression slopes, per-entity KPI trends), the line-fit companion
    * to [[cusumChangePoint]]'s step-shift locator: regress value
    * against the observation's position k = 1..n in (tsCol, idCol)
    * order and return the slope and intercept as EXACT RATIONALS —
    * `slope = slope_num / den`, `icept = icept_num / den` with
    *   slope_num = n·Σky − Σk·Σy
    *   icept_num = Σy·Σk² − Σk·Σky
    *   den       = n·Σk² − (Σk)²
    * No division is ever performed, so the result is bit-replayable in
    * any engine (the q100 sufficient-statistics contract, kept rational
    * instead of collapsing to a double).
    *
    * Exactness & overflow: values fix to `SCALE` units; all four sums
    * and the three products accumulate in DECIMAL(38,0). Bounds for
    * n rows/key with |units| ≤ u: Σk² ≤ n³/3 so |den| ≤ n⁴/3 and
    * |slope_num| ≤ n³·u — at n = 10⁹ and u = 10⁷ the largest term is
    * ~10³⁴ ≪ 10³⁸, so the decimals hold to a billion observations per
    * key without overflow (longs would saturate near n = 10⁵).
    *
    * Shape: ONE keyed shuffle — the row_number window and the keyed
    * aggregation cluster on the same key, so Catalyst reuses the
    * exchange; the agg itself is a map-side-combinable sum bundle.
    * A key with a single observation (den = 0, undefined slope) is
    * emitted with NULL rationals rather than dropped.
    * Output: (key, n, slope_num, icept_num, den) — rationals share den. */
  def trendFit(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(idCol),
        toUnits(col(valueCol)).as("__y"))
      .withColumn("__k", row_number().over(w).cast("long"))
    val agg = rows.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(dec(col("__k"))).as("__sk"),
      sum(dec(col("__y"))).as("__sy"),
      sum(dec(col("__k") * col("__y"))).as("__sky"),
      sum(dec(col("__k") * col("__k"))).as("__skk"))
    rationalsFromMoments(agg, keyCol)
  }

  /** The shared rational-fit epilogue over a moments frame
    * (key, n, __sk, __sy, __sky, __skk): slope/intercept numerators over
    * the shared denominator, NULL when the denominator is 0 (single
    * observation, or all x identical). */
  private def rationalsFromMoments(agg: DataFrame, keyCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val den = dec(col("n")) * col("__skk") - col("__sk") * col("__sk")
    agg.select(col(keyCol), col("n"),
      when(den === 0, lit(null))
        .otherwise(dec(col("n")) * col("__sky") - col("__sk") * col("__sy"))
        .cast("decimal(38,0)").as("slope_num"),
      when(den === 0, lit(null))
        .otherwise(col("__sy") * col("__skk") - col("__sk") * col("__sky"))
        .cast("decimal(38,0)").as("icept_num"),
      when(den === 0, lit(null)).otherwise(den)
        .cast("decimal(38,0)").as("den"))
  }

  /** MERGEABLE per-key trend sufficient statistics with x = event time
    * (WHOLE SECONDS since `originMicros`) — the incremental form of the
    * OLS fit: unlike [[trendFit]]'s position x (which depends on global
    * order), time-x moments are pure per-row products, so partial
    * frames from any data split (micro-batches, partitions, days) SUM
    * to the exact whole-series moments — the property the streaming
    * twin rides. One map-side-combinable agg, NO window, no shuffle
    * beyond the keyed exchange.
    *
    * x granularity is seconds (floor division on the µs offset —
    * exact: offsets < 2⁵³ divide exactly in a double and the true
    * quotient is never within 10⁻⁶ of rounding across an integer, and
    * SQL replays it as integer `//`): at µs granularity the INTERCEPT
    * numerator Σy·Σx² ≈ n²·ū·x̄² blows through 38 digits on a month of
    * ordinary data (measured 4·10³⁸ at sf0.01). Overflow at seconds:
    * largest term Σy·Σx² ≤ n²·u·X²; one year (X ≈ 3.2·10⁷) at
    * u = 10⁷ holds to n ≈ 10⁷ rows/key inside 10³⁸ — re-origin per
    * fit window (or widen the accumulator) past that; the origin is a
    * parameter precisely so callers keep x small. */
  def trendStatsTime(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, originMicros: Long): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    df.filter(col(valueCol).isNotNull)
      .select(col(keyCol),
        dec(floor((unix_micros(col(tsCol)) - lit(originMicros)) /
          lit(1000000.0)).cast("long")).as("__x"),
        dec(toUnits(col(valueCol))).as("__y"))
      .groupBy(col(keyCol)).agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("sk"),
        sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sky"),
        sum(col("__x") * col("__x")).as("skk"))
  }

  /** Collapse (possibly partial) [[trendStatsTime]] frames to the exact
    * rational fit: per-key SUM of each moment, then the shared rational
    * epilogue — merge-invariant, so any batch split hash-matches the
    * direct whole-series fit. */
  def trendFromStats(stats: DataFrame, keyCol: String): DataFrame =
    rationalsFromMoments(
      stats.groupBy(col(keyCol)).agg(
        sum(col("n")).as("n"),
        sum(col("sk")).as("__sk"),
        sum(col("sy")).as("__sy"),
        sum(col("sky")).as("__sky"),
        sum(col("skk")).as("__skk")),
      keyCol)

  /** Whole-series time-x trend fit: [[trendStatsTime]] + the rational
    * epilogue in one call (the batch twin of the streaming landing). */
  def trendFitTime(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, originMicros: Long): DataFrame =
    trendFromStats(trendStatsTime(df, keyCol, tsCol, valueCol, originMicros),
      keyCol)

  /** CUSUM change-point detection per key — the classic
    * mean-shift locator (deploy regressions, price regime changes,
    * sensor drift onset): for each key's series ordered by
    * (tsCol, idCol), the cumulative sum of deviations from the series
    * mean peaks in magnitude AT the change point (before a level
    * shift the deviations accumulate one sign, after it they unwind).
    * Returns one row per key: the argmax position and its deviation
    * magnitude.
    *
    * Exactness: all integer. Values fix to `SCALE` units; the mean
    * division is AVOIDED by scaling — with S_k the running unit sum,
    * T the series total, and n the count,
    * `cusum_k·n = n·S_k − k·T` (the classic statistic times n, same
    * argmax). Overflow: |n·S_k| ≤ n²·max|units| — longs hold series
    * to ~10⁹ rows·unit-magnitude 10⁴; past that move the two products
    * to DECIMAL(38,0). Argmax tie-break: highest |cusum|, then
    * earliest (ts, id) — fully deterministic, replayed by the
    * oracle's row_number.
    *
    * Shape: ONE keyed shuffle; running sum, row number, and the series
    * total/count all come out of the same sorted window pass (the
    * total via an unbounded frame — no second scan, no join), then a
    * per-key rank pass over the same partitioning picks the peak
    * (Catalyst reuses the exchange: both windows cluster on the key).
    * Output: (key, ts, id, cusum_xn, n). */
  def cusumChangePoint(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val wAll = Window.partitionBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // dunder-prefixed internals: the generic names (k, t, n, …) would
    // shadow same-named USER columns — including the key itself
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(idCol), toUnits(col(valueCol)).as("__u"))
      .withColumn("__s", sum(col("__u")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__k", row_number().over(w))
      .withColumn("__t", sum(col("__u")).over(wAll))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("cusum_xn", col("__n") * col("__s") - col("__k") * col("__t"))
    val rank = row_number().over(Window.partitionBy(col(keyCol))
      .orderBy(abs(col("cusum_xn")).desc, col(tsCol), col(idCol)))
    rows.withColumn("__r", rank).filter(col("__r") === 1)
      .select(col(keyCol), col(tsCol), col(idCol),
        abs(col("cusum_xn")).as("cusum_xn"), col("__n").as("n"))
  }

  /** Exponentially weighted moving average per key, ordered by
    * (tsCol, idCol): y_1 = x_1, y_t = (α·x_t + (100−α)·y_{t−1}) div 100
    * in integer units — the classic smoothing/decay feature (EMA price,
    * decayed engagement, drift baseline) with a replayable recurrence.
    *
    * Output: (keyCol, idCol, ewma_units), one row per input row.
    *
    * Scale shape: ONE keyed shuffle (groupBy key); the fold runs in-row
    * over the key's sorted events via the compiled EwmaFold expression —
    * one O(n) pass per key (the aggregate-HOF form it replaces copied
    * its accumulator array per row: O(n²) per key). Parallelism = key
    * count, state = one key's rows. The recurrence is inherently
    * sequential per key (y_t needs y_{t−1}), so per-key linearity is the
    * floor any engine pays; for keys too hot to hold in one task, use
    * [[ewmaSegmented]], which bounds task state to one segment and
    * chains boundary states (bit-equal, spec-asserted). */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String, alphaNum: Int): DataFrame = {
    require(alphaNum > 0 && alphaNum < 100, "alphaNum is a percentage")
    graft.functions.CatalystExpressions.register(df.sparkSession)
    df.select(col(keyCol), struct(col(tsCol).as("ts"),
        col(idCol).cast("long").as("id"),
        toUnits(col(valueCol)).as("xu")).as("r"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(col("r"))).as("rs"))
      .select(col(keyCol), explode(call_function("graft_ewma_fold",
        col("rs"), lit(alphaNum), lit(null).cast("long"))).as("e"))
      .select(col(keyCol), col("e.id").as(idCol), col("e.y").as("ewma_units"))
  }

  /** Greedy time-throttle per key — the debounce/rate-limiter (alert
    * dedup, notification caps, "at most one per T" delivery): keep an
    * event iff ≥ `gapMs` elapsed since the last KEPT event of the same
    * key. The kept set depends on prior OUTPUT (a dropped event does
    * not reset the clock — `lag()` cannot express this), so it joins
    * the [[ewma]] recurrence family: ONE keyed shuffle
    * (collect + sort), then the compiled O(1)-state
    * [[graft.functions.CatalystExpressions.ThrottleFold]] kernel; the
    * SQL oracle replays the exact chain with a pre-numbered recursive
    * CTE. Ordering (tsCol, idCol); equal-timestamp events after a kept
    * one are dropped for any gap > 0. Hot keys: the fold state is one
    * long — for keys whose history exceeds task memory, segment with
    * the [[ewmaSegmented]] construction (ThrottleFold takes the same
    * `init` seed). Output: one (key, id, kept) row per input event. */
  def throttle(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      gapMs: Long): DataFrame = {
    require(gapMs > 0, "gap must be positive")
    graft.functions.CatalystExpressions.register(df.sparkSession)
    df.select(col(keyCol), struct(unix_micros(col(tsCol)).as("tsu"),
        col(idCol).cast("long").as("id")).as("r"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(col("r"))).as("rs"))
      .select(col(keyCol), explode(call_function("graft_throttle_fold",
        col("rs"), lit(gapMs * 1000L), lit(null).cast("long"))).as("e"))
      .select(col(keyCol), col("e.id").as(idCol), col("e.kept").as("kept"))
  }

  /** [[ewma]] with bounded per-task state: the series is cut into
    * chronological segments (`segment` — e.g. `to_date(ts)`), each
    * segment folds with one keyed shuffle over ONLY its own rows, and the
    * per-key boundary state (the segment's final y) seeds the next
    * segment's fold via EwmaFold's `init` argument. Bit-equal to the
    * whole-series [[ewma]] (spec-asserted): seeding y₀ makes the first
    * row of segment s compute `(α·x + (100−α)·y₀) div 100` — exactly the
    * step the unsegmented fold performs at that row.
    *
    * Scale shape: a driver loop over the ORDERED DISTINCT segment values
    * (a bounded collect — calendar days/hours, the same driver-side-state
    * class as the IVF codebooks), one job per segment. Task memory is one
    * key's rows *within one segment* instead of the whole series — the
    * hot-key mitigation for keys whose full history cannot hold in a
    * task. The carried state relation is |keys| rows, localCheckpointed
    * each step so lineage stays flat across segments; keys absent from a
    * segment carry their state through unchanged (union + max_by merge —
    * one keyed aggregation, never a join, so the per-segment stats
    * estimate stays additive). The state DataFrame is rebuilt from the
    * checkpointed RDD each step: a checkpointed Dataset CARRIES its
    * origin plan's statistics, and threading them through the
    * seed-join → fold → merge cycle compounds sizeInBytes
    * multiplicatively across segments (observed: BigInt stats whose bit
    * count doubled per segment — planning time went exponential past
    * ~20 segments). Rebuilding from the RDD resets to a constant
    * default estimate; AQE re-plans the seed join from actual runtime
    * sizes, so the estimate's coarseness costs nothing. */
  def ewmaSegmented(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, alphaNum: Int,
      segment: Column): DataFrame = {
    require(alphaNum > 0 && alphaNum < 100, "alphaNum is a percentage")
    graft.functions.CatalystExpressions.register(df.sparkSession)
    val withSeg = df.withColumn("__seg", segment)
    val segs = withSeg.select(col("__seg")).distinct()
      .orderBy(col("__seg")).collect().map(_.get(0))
    if (segs.isEmpty) return ewma(df, keyCol, tsCol, idCol, valueCol, alphaNum)
    var state: DataFrame = null // (keyCol, __y0): last y per key so far
    val outs = Seq.newBuilder[DataFrame]
    for (sv <- segs) {
      val rows = withSeg.filter(col("__seg") <=> lit(sv))
        .select(col(keyCol), struct(col(tsCol).as("ts"),
          col(idCol).cast("long").as("id"),
          toUnits(col(valueCol)).as("xu")).as("r"))
        .groupBy(keyCol)
        .agg(sort_array(collect_list(col("r"))).as("rs"))
      val seeded =
        if (state == null) rows.withColumn("__y0", lit(null).cast("long"))
        else rows.join(state, Seq(keyCol), "left")
      // localCheckpoint: `folded` is read twice (output + next state), and
      // eager materialization keeps each segment's fold one bounded job
      val folded = seeded.select(col(keyCol),
        call_function("graft_ewma_fold",
          col("rs"), lit(alphaNum), col("__y0")).as("es"))
        .localCheckpoint()
      outs += folded
        .select(col(keyCol), explode(col("es")).as("e"))
        .select(col(keyCol), col("e.id").as(idCol), col("e.y").as("ewma_units"))
      val segState = folded.select(col(keyCol),
        element_at(col("es"), -1).getField("y").as("__y0"))
      val merged =
        if (state == null) segState
        // newer segment wins per key (__p 1 beats 0); each side holds at
        // most one row per key, so max_by is deterministic
        else state.withColumn("__p", lit(0))
          .unionAll(segState.withColumn("__p", lit(1)))
          .groupBy(keyCol).agg(max_by(col("__y0"), col("__p")).as("__y0"))
      val ck = merged.localCheckpoint()
      state = ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
    }
    outs.result().reduce(_ unionAll _)
  }

  /** The recursive-CTE ANSI SQL replay of [[ewma]] for a DuckDB oracle:
    * `rowsSql` must produce (key, id, xu, rn) with rn = row_number per
    * key in (ts, id) order and xu already in units. */
  def ewmaOracleSql(rowsSql: String, alphaNum: Int): String = {
    val a = alphaNum
    val b = 100 - alphaNum
    s"WITH RECURSIVE x AS ($rowsSql), w AS (" +
      "SELECT key, id, rn, xu AS y FROM x WHERE rn = 1 " +
      "UNION ALL " +
      s"SELECT x.key, x.id, x.rn, ($a * x.xu + $b * w.y) // 100 " +
      "FROM x JOIN w ON x.key = w.key AND x.rn = w.rn + 1) " +
      "SELECT key, id, y AS ewma_units FROM w"
  }
}
