package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Recs.coVisitation]]: co-occurrence pair
  * maintenance over an unbounded stream of (basket, item) arrivals — the
  * live "frequently bought together" counter a commerce stack keeps as
  * carts grow, instead of re-mining the transaction log.
  *
  * Per-basket state is the sorted DISTINCT item set seen so far (≤
  * `maxBasket` longs — bounded exactly like the batch operator's basket
  * slice). When an item joins a basket it emits one pair against each
  * item already present, so every unordered distinct pair of a basket is
  * emitted EXACTLY ONCE — at the moment its second member arrives —
  * whatever the micro-batch cadence. Summing emitted pairs therefore
  * reproduces the batch operator's co-occurrence counts bit-for-bit
  * (spec-asserted across random batch splits), and the downstream top-k
  * serve is shared with the batch path.
  *
  * Cap semantics when `maxBasket` BINDS: the stream keeps the first
  * `maxBasket` distinct items in ARRIVAL order (an incremental fold
  * cannot know the eventual lowest ids; retroactively evicting an item
  * would invalidate already-emitted pairs), while the batch slice keeps
  * the LOWEST ids. Bounded state is the invariant; the exact truncation
  * set is not — equivalence to batch holds whenever the cap does not
  * bind, which is the oracle regime (the q138 approximate-regime
  * documentation pattern).
  *
  * Ordering: none required — pair emission is order-insensitive up to
  * the cap (set union is commutative), so this stream has NO event-time
  * contract to break, unlike [[EwmaStream]]/[[FunnelStream]].
  *
  * Scale shape: one keyed state exchange per micro-batch; state =
  * |open baskets| × (≤ maxBasket) longs. Baskets never expire under
  * NoTimeout — carts have a checkout/abandonment horizon, so a real
  * deployment applies the [[EwmaStream]] EventTimeTimeout pattern to
  * retire closed baskets (an evicted basket restarting at empty would
  * UNDERCOUNT cross-eviction pairs; eviction is only sound past the
  * basket's completion horizon). */
object CoVisitStream {

  final case class CvEv(basket: Long, item: Long)
  final case class CvState(items: Array[Long])
  final case class CvPair(pa: Long, pb: Long)

  private[streaming] def coVisitGroup(maxBasket: Int)(
      basket: Long, events: Iterator[CvEv],
      state: GroupState[CvState]): Iterator[CvPair] = {
    val have = scala.collection.mutable.TreeSet.empty[Long]
    state.getOption.foreach(s => have ++= s.items)
    val before = have.size
    val out = scala.collection.mutable.ArrayBuffer.empty[CvPair]
    // sorted pass over the batch's distinct new items: deterministic
    // emission order within a batch (the counts are order-free anyway)
    events.map(_.item).toArray.distinct.sorted.foreach { it =>
      if (!have.contains(it) && have.size < maxBasket) {
        have.foreach { e =>
          out += (if (e < it) CvPair(e, it) else CvPair(it, e))
        }
        have += it
      }
    }
    if (have.size != before) state.update(CvState(have.toArray))
    out.iterator
  }

  /** Streaming pair emission over a typed (basket, item) stream. Update
    * mode: a micro-batch emits exactly the pairs NEWLY completed by its
    * arrivals. Aggregate the emissions to get live co-occurrence
    * counts. */
  def streaming(events: Dataset[CvEv],
      maxBasket: Int = 10000): Dataset[CvPair] = {
    require(maxBasket <= 20000,
      s"maxBasket $maxBasket exceeds the pair kernel's 20000-item bound")
    import events.sparkSession.implicits._
    events.groupByKey(_.basket)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        coVisitGroup(maxBasket))
  }
}
