package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-time enrichment — the incremental twin of
  * `ops/Dimension.pitJoin` (q103/q126) and the feature-SERVING shape of
  * the feature store: a single keyed stream carries both DIMENSION
  * VERSION rows (kind 0 — an SCD2 change: this key's attribute value
  * valid from ts_us) and FACT rows (kind 1), and each fact emits
  * exactly once, enriched with the attribute version current AT ITS
  * EVENT TIME. Serving features this way — maintaining the "current
  * version per key" as stream state instead of re-joining the
  * dimension per batch — is what keeps training-time `pitJoin` and
  * serving-time lookup consistent (the training/serving skew guard
  * that pairs with q126's staleness bound).
  *
  * Semantics match the batch as-of exactly (spec-asserted, and q130
  * shares q103's ASOF-join oracle via batch-equivalence): at equal
  * instants the version applies FIRST (a fact at the version's own
  * ts_us sees it — `valid_from <= fact ts`, the pitJoin `__k` sort
  * key), facts before a key's first version carry NULL (and kind=1
  * input rows carry attr=NULL by construction — the fact's enrichment
  * comes from STATE, never from its own row).
  *
  * Ordering contract (the [[EwmaStream]] class, not [[Sessionize]]'s
  * late-absorbing min/max): WITHIN a micro-batch the group function
  * sorts (state functions see an unordered iterator); ACROSS batches
  * the landing layout must deliver a key's rows in nondecreasing
  * event time. A version row older than the carried state never
  * regresses it (monotone guard), so a late DUPLICATE version is
  * harmless; a late fact would enrich against a newer version than
  * its event time saw — replay the affected window with the batch
  * `pitJoin` when the contract breaks.
  *
  * Scale shape: one keyed state exchange per micro-batch; state per
  * key = one (long, attr) — the current version only, never the
  * version history (the as-of lookup needs nothing older once arrival
  * order is nondecreasing). NoTimeout is the bounded-key-universe
  * default (dimension keys: customers, devices, symbols); an
  * unbounded key space wants the [[EwmaStream.streamingWithTtl]]
  * eviction pattern. */
object EnrichStream {

  /** kind 0 = dimension version (attr set, fact_id = -1);
    * kind 1 = fact (attr = null, fact_id set). */
  final case class In(k: Long, ts_us: Long, kind: Int, attr: String,
    fact_id: Long)
  final case class AState(valid_from: Long, attr: String)
  final case class Out(fact_id: Long, k: Long, ts_us: Long, attr: String)

  private[streaming] def enrichGroup(k: Long, rows: Iterator[In],
      state: GroupState[AState]): Iterator[Out] = {
    // (ts, kind, fact_id): version before fact at equal instants — the
    // pitJoin tie rule — and fact ties deterministic by id
    val sorted = rows.toSeq.sortBy(r => (r.ts_us, r.kind, r.fact_id))
    var cur = state.getOption
    val out = Seq.newBuilder[Out]
    for (r <- sorted) {
      if (r.kind == 0) {
        if (cur.forall(_.valid_from <= r.ts_us))
          cur = Some(AState(r.ts_us, r.attr))
      } else out += Out(r.fact_id, k, r.ts_us, cur.map(_.attr).orNull)
    }
    cur.foreach(state.update)
    out.result().iterator
  }

  /** Append-mode enrichment over the tagged version+fact stream. */
  def enriched(input: Dataset[In]): Dataset[Out] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        enrichGroup)
  }
}
