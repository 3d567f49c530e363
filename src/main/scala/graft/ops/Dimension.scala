package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) history over a change log —
  * the temporal modeling step every warehouse keeps next to its facts:
  * each key's attribute history as half-open validity intervals
  * `[valid_from, valid_to)`, `valid_to` NULL on the current row.
  *
  * Two entry points mirror the two production regimes:
  *  - [[scd2Build]] — full build from a change log (backfill);
  *  - [[scd2Apply]] — incremental: merge a batch of NEW change events
  *    into a stored dimension, touching only the affected keys' current
  *    rows — O(|batch| + |current rows of affected keys|), never a
  *    history rescan. At 100 TB of history this is the difference
  *    between a nightly rebuild and a minutely refresh; closed rows are
  *    immutable and never rewritten (they can live on cold storage).
  *
  * Both are deterministic and SQL-replayable: apply-then-read must be
  * hash-identical to a from-scratch build over the full log (the q87
  * oracle asserts exactly that).
  */
object Dimension {

  /** Build an SCD2 history from a change log `(keyCol, tsCol, attrCols…)`
    * with at most one row per (key, ts) — caller's contract, like
    * Lake.mergeInto's key uniqueness (pre-aggregate the log if raw events
    * can collide on ts).
    *
    * Change points are rows whose attribute tuple differs from the key's
    * previous log row (consecutive duplicates collapse — re-stating the
    * same value extends the current interval instead of splitting it);
    * `valid_from` = the change's ts, `valid_to` = the next change's ts,
    * `is_current` = no later change.
    *
    * Scale shape: two windows over the SAME (key × ts) ordering — one
    * keyed shuffle, the lag and lead reuse the sort. Parallelism = key
    * count; no global sort anywhere. */
  def scd2Build(changes: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2Build needs at least one attribute column")
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val attrs = struct(attrCols.map(col): _*)
    changes
      .withColumn("__prev", lag(attrs, 1).over(byKey))
      // null-safe: the key's first row (prev NULL) is always a change
      // point, and a NULL attribute value still compares decisively
      .filter(!(col("__prev") <=> attrs))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select(((keyCol +: attrCols.toIndexedSeq) ++
        Seq("valid_from", "valid_to", "is_current")).map(col): _*)
  }

  /** Merge a batch of NEW change events into a stored SCD2 dimension.
    *
    * Contract (documented, like mergeInto's partition stability): every
    * batch event's ts is later than the affected key's current
    * `valid_from` — the append-only-in-time regime of a live change
    * feed; late/backdated corrections need a rebuild of the affected
    * keys from the raw log.
    *
    * Plan: the batch's key set is broadcast; dimension rows of
    * unaffected keys pass through an anti-join UNTOUCHED (never read
    * beyond the join column at scale, never rewritten), affected keys'
    * CLOSED rows likewise (history is immutable), and only the affected
    * keys' current rows — re-expressed as pseudo-events at their
    * `valid_from` — are recomputed together with the batch through
    * [[scd2Build]]. A batch event that re-states the current value
    * collapses into the open interval (no new row), exactly as the full
    * rebuild would have it. */
  def scd2Apply(dim: DataFrame, batch: DataFrame, keyCol: String,
      tsCol: String, attrCols: Seq[String]): DataFrame = {
    val keys = batch.select(col(keyCol)).distinct()
    val untouched = dim.join(keys, Seq(keyCol), "left_anti")
    val affected = dim.join(keys, Seq(keyCol), "left_semi")
    val closed = affected.filter(!col("is_current"))
    val currentAsEvents = affected.filter(col("is_current"))
      .select((keyCol +: attrCols.toIndexedSeq).map(col) :+
        col("valid_from").as(tsCol): _*)
    val events = currentAsEvents.unionByName(
      batch.select((keyCol +: attrCols.toIndexedSeq).map(col) :+ col(tsCol): _*))
    untouched
      .unionByName(closed)
      .unionByName(scd2Build(events, keyCol, tsCol, attrCols))
  }

  /** Point-in-time join: each fact row picks up the dimension attributes
    * that were valid AT the fact's timestamp — the feature-store
    * "PIT-correctness" lookup that prevents training-label leakage (a
    * fact must never see a dimension version from its future) and the
    * standard fact⋈SCD2 enrichment.
    *
    * Semantics: the version with the LARGEST `valid_from` ≤ fact time
    * (valid_from inclusive, matching [[scd2Build]]'s half-open
    * intervals); facts before a key's first version get NULL attributes
    * (left semantics).
    *
    * Scale shape — the q18 as-of shape, not an interval join: version
    * rows and fact rows UNION into one relation tagged so a version
    * sorts before a fact at the same instant, ONE window per key carries
    * the latest attribute struct forward (`last(…, ignoreNulls)` over an
    * incremental frame — O(1) state per row), facts filter back out. One
    * keyed shuffle of |facts|+|versions| rows, no join node at all — a
    * BETWEEN-join on the validity interval would plan as a range join
    * and shuffle-or-nested-loop at 100× this; the oracle replays exactly
    * that declarative interval join, so the equivalence is hash-checked.
    *
    * `dim` needs `(keyCol, valid_from, attrCols…)`; rename attribute
    * columns first if they would collide with fact columns. */
  def pitJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
      factTimeCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "pitJoin needs at least one attribute column")
    asOfCarry(facts, dim, keyCol, factTimeCol, struct(attrCols.map(col): _*))
      .select(facts.columns.map(c => col("__fact." + c)).toIndexedSeq ++
        attrCols.map(c => col("__a." + c)): _*)
  }

  /** Shared as-of machinery of [[pitJoin]] / [[pitJoinStale]]: union
    * version rows (tagged to sort before facts at equal instants) with
    * fact rows, carry the latest `attrStruct` forward per key with one
    * O(1)-state window, return the FACT rows with `__fact` (the
    * original fact struct), `__a` (the carried attributes, NULL before
    * a key's first version) and `__t` (the fact instant). */
  private def asOfCarry(facts: DataFrame, dim: DataFrame, keyCol: String,
      factTimeCol: String, attrStruct: org.apache.spark.sql.Column,
      forward: Boolean = false): DataFrame = {
    val factStruct = struct(facts.columns.map(col).toIndexedSeq: _*)
    val vRows = dim.select(col(keyCol).as("__key"),
      col("valid_from").as("__t"), lit(0).as("__k"),
      attrStruct.as("__attrs"))
    val attrType = vRows.schema("__attrs").dataType
    val fRows = facts.select(col(keyCol).as("__key"),
      col(factTimeCol).as("__t"), lit(1).as("__k"),
      lit(null).cast(attrType).as("__attrs"), factStruct.as("__fact"))
    val factType = fRows.schema("__fact").dataType
    // forward: scan from the FUTURE side (time descending) so "last
    // version seen" is the NEAREST version at-or-after the fact; the
    // version-before-fact tag order at equal instants is unchanged, so
    // a version at exactly the fact's instant matches in BOTH directions
    val tOrd = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col("__key")).orderBy(tOrd, col("__k"))
      .rowsBetween(Window.unboundedPreceding, 0)
    vRows.withColumn("__fact", lit(null).cast(factType))
      .unionByName(fRows)
      .withColumn("__a", last(col("__attrs"), ignoreNulls = true).over(w))
      .filter(col("__k") === 1)
  }

  /** FORWARD point-in-time join — [[pitJoin]] mirrored in time: every
    * fact picks up the EARLIEST dimension version valid at-or-after its
    * instant (facts after a key's last version get NULL). The
    * lead-time / what-happened-next lookup: trade → next quote,
    * order → next status change, event → next deploy; also the
    * training-data shape for next-action labeling, where each example
    * row is annotated with the first outcome version that follows it.
    * Same one-shuffle no-join-node plan as [[pitJoin]] — the window
    * just scans time DESCENDING, so the O(1)-state carry holds the
    * nearest FUTURE version instead of the nearest past one. A version
    * at exactly the fact's instant matches in both directions
    * (backward "at or before" / forward "at or after" — both
    * inclusive, the ASOF convention). */
  def pitJoinNext(facts: DataFrame, dim: DataFrame, keyCol: String,
      factTimeCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "pitJoinNext needs at least one attribute column")
    asOfCarry(facts, dim, keyCol, factTimeCol, struct(attrCols.map(col): _*),
        forward = true)
      .select(facts.columns.map(c => col("__fact." + c)).toIndexedSeq ++
        attrCols.map(c => col("__a." + c)): _*)
  }

  /** [[pitJoin]] with a STALENESS bound — the feature-store freshness
    * contract: a dimension version older than `maxAgeUs` at the fact's
    * instant is treated as MISSING (NULL attributes), exactly like a
    * key with no version yet. Serving stale features silently is the
    * classic training/serving skew bug; the bound makes "too old" an
    * explicit, replayable data rule rather than an accident of load
    * cadence. Same one-shuffle no-join-node shape as [[pitJoin]]: the
    * version's own timestamp rides inside the carried attribute struct
    * (`__vt`), and the age check is a row-local post-filter on the
    * window output — no second join, no extra exchange. */
  def pitJoinStale(facts: DataFrame, dim: DataFrame, keyCol: String,
      factTimeCol: String, attrCols: Seq[String], maxAgeUs: Long): DataFrame = {
    require(attrCols.nonEmpty, "pitJoinStale needs at least one attribute column")
    require(maxAgeUs >= 0, s"maxAgeUs must be >= 0, got $maxAgeUs")
    // cast: date / TIMESTAMP_NTZ validity columns normalize to the
    // session-zoned instant (identical under the UTC session)
    val attrStruct = struct(
      unix_micros(col("valid_from").cast("timestamp")).as("__vt") +:
        attrCols.map(col): _*)
    val fresh = col("__a").isNotNull &&
      unix_micros(col("__t").cast("timestamp")) - col("__a.__vt") <= maxAgeUs
    asOfCarry(facts, dim, keyCol, factTimeCol, attrStruct)
      .select(facts.columns.map(c => col("__fact." + c)).toIndexedSeq ++
        attrCols.map(c =>
          when(fresh, col("__a." + c)).otherwise(lit(null)).as(c)): _*)
  }
}
