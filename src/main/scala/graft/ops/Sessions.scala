package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization as a one-exchange O(1)-state fold —
  * the q121 shape, factored out of the query so the hot-key-bounded
  * segmented variant can chain the same accumulator (the q93/q111
  * family: ONE keyed shuffle collecting each user's time-sorted events,
  * then a row-local fold whose state never grows — vs the lag/cumsum
  * window formulation that shuffles twice and sorts per window).
  *
  * Accumulator (6 longs): prev event ts, open-session start, open
  * run length `cur` (0 = no events yet — the seedable sentinel),
  * session count `ns`, longest closed run `lg`, max closed duration
  * `md`. The finish step folds the still-open session in. Splitting
  * the fold from the finish is what makes the accumulator CHAINABLE:
  * segment s+1 seeds with segment s's raw accumulator and the open
  * session continues (or gap-closes) exactly as the whole-series fold
  * would at that row. */
object Sessions {

  /** Per-user (n_sessions, longest_n, max_dur_us) with sessions split
    * at gaps > `gapUs` in strict (ts, id) order. */
  def sessionStats(events: DataFrame, gapUs: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val folded = rawFold(histories(events, userCol, tsCol, idCol), gapUs,
      s"named_struct('prev', CAST(-1 AS BIGINT), 'start', CAST(0 AS BIGINT), " +
        "'cur', CAST(0 AS BIGINT), 'ns', CAST(0 AS BIGINT), " +
        "'lg', CAST(0 AS BIGINT), 'md', CAST(0 AS BIGINT))")
    finish(folded, userCol)
  }

  /** [[sessionStats]] with bounded per-task state — the hot-key
    * mitigation (VERDICT r11 "what's wrong" #1, the
    * [[TimeSeries.ewmaSegmented]] / [[Funnel.funnelSegmented]]
    * construction): the collect_list buffer holds one user's events
    * within ONE `segment` (e.g. one day), and the 6-long raw
    * accumulator chains across segments, so the result is bit-equal to
    * the whole-series fold (spec-asserted) while a bot key's task
    * memory is bounded by its busiest segment. Driver loop over the
    * ordered distinct segment values (bounded collect — calendar
    * days); keys absent from a segment carry through via union +
    * max_by, never a join. `segment` must be chronologically
    * consistent with (`tsCol`, `idCol`) order — e.g. `to_date(ts)`. */
  def sessionStatsSegmented(events: DataFrame, gapUs: Long, segment: Column,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val withSeg = events.withColumn("__seg", segment)
    val segs = withSeg.select(col("__seg")).distinct()
      .orderBy(col("__seg")).collect().map(_.get(0))
    if (segs.isEmpty) return sessionStats(events, gapUs, userCol, tsCol, idCol)
    val accCols = Seq("prev", "start", "cur", "ns", "lg", "md")
    var state: DataFrame = null // (u, prev, start, cur, ns, lg, md)
    for (sv <- segs) {
      val perUser = histories(withSeg.filter(col("__seg") <=> lit(sv)),
        userCol, tsCol, idCol)
      val seeded =
        if (state == null) accCols.foldLeft(perUser)((d, c) =>
          d.withColumn(s"__${c}0",
            lit(if (c == "prev") -1L else 0L)))
        else {
          val renamed = accCols.foldLeft(state)((d, c) =>
            d.withColumnRenamed(c, s"__${c}0"))
          val joined = perUser.join(renamed, Seq("u"), "left")
          accCols.foldLeft(joined)((d, c) =>
            d.withColumn(s"__${c}0", coalesce(col(s"__${c}0"),
              lit(if (c == "prev") -1L else 0L))))
        }
      val folded = rawFold(seeded, gapUs,
        accCols.map(c => s"'$c', __${c}0").mkString("named_struct(", ", ", ")"))
        .localCheckpoint()
      val merged =
        if (state == null) folded
        else state.withColumn("__p", lit(0))
          .unionAll(folded.withColumn("__p", lit(1)))
          .groupBy(col("u"))
          .agg(max_by(struct(accCols.map(col): _*), col("__p")).as("a"))
          .select(col("u") +: accCols.map(c => col(s"a.$c").as(c)): _*)
      // rebuild from the RDD so checkpointed plan statistics don't
      // compound across segments (the ewmaSegmented lesson)
      val ck = merged.localCheckpoint()
      state = ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
    }
    finish(state, userCol)
  }

  private def histories(events: DataFrame, userCol: String, tsCol: String,
      idCol: String): DataFrame =
    events.select(col(userCol).as("u"),
        struct(unix_micros(col(tsCol)).as("ts_us"),
          col(idCol).cast("long").as("id")).as("r"))
      .groupBy(col("u")).agg(sort_array(collect_list(col("r"))).as("rs"))

  /** The gap fold WITHOUT the finish step — returns the raw
    * accumulator columns so callers can chain or finish. */
  private def rawFold(seeded: DataFrame, gapUs: Long,
      initSql: String): DataFrame =
    seeded.select(col("u"), expr(
      s"""aggregate(rs,
         |  $initSql,
         |  (acc, x) -> IF(acc.cur = 0,
         |    named_struct('prev', x.ts_us, 'start', x.ts_us,
         |      'cur', CAST(1 AS BIGINT), 'ns', acc.ns + 1,
         |      'lg', acc.lg, 'md', acc.md),
         |    IF(x.ts_us - acc.prev > $gapUs,
         |      named_struct('prev', x.ts_us, 'start', x.ts_us,
         |        'cur', CAST(1 AS BIGINT), 'ns', acc.ns + 1,
         |        'lg', GREATEST(acc.lg, acc.cur),
         |        'md', GREATEST(acc.md, acc.prev - acc.start)),
         |      named_struct('prev', x.ts_us, 'start', acc.start,
         |        'cur', acc.cur + 1, 'ns', acc.ns,
         |        'lg', acc.lg, 'md', acc.md))))""".stripMargin).as("f"))
      .select(col("u"), col("f.prev").as("prev"), col("f.start").as("start"),
        col("f.cur").as("cur"), col("f.ns").as("ns"), col("f.lg").as("lg"),
        col("f.md").as("md"))

  private def finish(acc: DataFrame, userCol: String): DataFrame =
    acc.select(col("u").as(userCol), col("ns").as("n_sessions"),
      greatest(col("lg"), col("cur")).as("longest_n"),
      greatest(col("md"), col("prev") - col("start")).as("max_dur_us"))
}
