package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sketch aggregations for heavy-key discovery at scale.
  *
  * [[SpaceSaving]] (Metwally, Agrawal & El Abbadi, "Efficient computation
  * of frequent and top-k elements in data streams", ICDT 2005) as a typed
  * `Aggregator`: bounded-memory top-k counting that partial-aggregates
  * map-side and merges associatively — the shape Spark needs for a
  * 2-phase HashAggregate, so a 100 TB token stream reduces to `capacity`
  * counters per task before any shuffle.
  *
  * Guarantees (capacity m over n items):
  *  - any item with true count > n/m is in the sketch;
  *  - reported count overestimates by at most the recorded `err`;
  *  - with m ≥ distinct(items) the sketch is EXACT (err = 0 everywhere),
  *    which is what makes the declared query (q44) oracle-checkable.
  */
object Sketches {

  /** counts: item -> (count, overestimate-error) */
  type SSState = Map[String, (Long, Long)]

  case class HeavyHitter(item: String, cnt: Long, err: Long)

  class SpaceSaving(capacity: Int)
      extends Aggregator[String, SSState, Seq[HeavyHitter]] {

    override def zero: SSState = Map.empty

    override def reduce(st: SSState, item: String): SSState =
      st.get(item) match {
        case Some((c, e)) => st.updated(item, (c + 1, e))
        case None if st.size < capacity => st.updated(item, (1L, 0L))
        case None =>
          // evict the minimum counter; the newcomer inherits its count as
          // upper-bound error (the SpaceSaving step)
          val (minItem, (minC, _)) = st.minBy { case (k, (c, _)) => (c, k) }
          (st - minItem).updated(item, (minC + 1, minC))
      }

    override def merge(a: SSState, b: SSState): SSState = {
      // standard sketch merge: sum common counters; a key absent from one
      // side could have been evicted there, so its floor error is that
      // side's minimum counter (0 if that side never evicted / is empty)
      def floor(st: SSState): Long =
        if (st.size < capacity) 0L else st.values.map(_._1).min
      val fa = floor(a)
      val fb = floor(b)
      val merged = (a.keySet ++ b.keySet).iterator.map { k =>
        val (ca, ea) = a.getOrElse(k, (fa, fa))
        val (cb, eb) = b.getOrElse(k, (fb, fb))
        k -> (ca + cb, ea + eb)
      }.toMap
      if (merged.size <= capacity) merged
      else merged.toSeq
        .sortBy { case (k, (c, _)) => (-c, k) }
        .take(capacity)
        .toMap
    }

    override def finish(st: SSState): Seq[HeavyHitter] =
      st.toSeq.map { case (k, (c, e)) => HeavyHitter(k, c, e) }
        .sortBy(h => (-h.cnt, h.item))

    override def bufferEncoder: Encoder[SSState] = Encoders.kryo[SSState]
    override def outputEncoder: Encoder[Seq[HeavyHitter]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HeavyHitter]]()
  }

  /** Heavy hitters over a string column: explode-free typed aggregation.
    * Returns (item, cnt, err) rows, count-descending. */
  def heavyHitters(items: DataFrame, itemCol: String, capacity: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val ds = items.select(col(itemCol).cast("string")).as[String]
    val sketch = new SpaceSaving(capacity).toColumn
    ds.select(sketch.as[Seq[HeavyHitter]])
      .flatMap(identity)
      .toDF("item", "cnt", "err")
  }
}
