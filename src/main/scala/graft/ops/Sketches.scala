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

  case class HeavyHitter(item: String, cnt: Long, err: Long)

  /** Mutable bounded counter table for SpaceSaving: an open-addressing
    * hash map (linear probing + tombstones) over parallel primitive
    * arrays, mutated in place. The `Aggregator` contract allows `reduce`
    * and `merge` to mutate and return their buffer, which is what makes
    * the per-item hot path allocation-free: the previous immutable-`Map`
    * buffer allocated a fresh map per input row (`Map.updated`) and paid
    * a boxed O(capacity) `minBy` per eviction — at a 100 TB token stream
    * that per-row churn is exactly the cost the sketch exists to avoid.
    *
    * The table is the next power of two ≥ 4×capacity, so live entries
    * occupy ≤ ~25% of slots and tombstones another ≤ 25% before a
    * rehash — probe chains stay O(1). The hit path (existing key) is a
    * probe + in-place `cnts(i) += 1`. Eviction — only reached when a NEW
    * key meets a FULL table — keeps the original deterministic
    * (count, key) argmin tie-break via one primitive-array scan.
    */
  final class SSBuffer(val capacity: Int) extends Serializable {
    private[ops] val tableSize: Int = {
      var t = 8; while (t < capacity * 4) t <<= 1; t
    }
    private val mask = tableSize - 1
    private val keys = new Array[String](tableSize)
    private val dead = new Array[Boolean](tableSize) // tombstones (key = null)
    private val cnts = new Array[Long](tableSize)
    private val errs = new Array[Long](tableSize)
    private[ops] var used = 0
    private var tombs = 0

    private def slot(key: String): Int = {
      // spread String.hashCode's low-entropy high bits before masking
      val h = key.hashCode * 0x9E3779B9
      (h ^ (h >>> 16)) & mask
    }

    /** Slot of `key`, or -1. Probes past tombstones, stops at empty. */
    private def find(key: String): Int = {
      var i = slot(key)
      while (keys(i) != null || dead(i)) {
        if (key == keys(i)) return i
        i = (i + 1) & mask
      }
      -1
    }

    /** Precondition: `key` absent. Reuses the first tombstone on the
      * probe path, else the terminating empty slot. */
    private[ops] def insert(key: String, c: Long, e: Long): Unit = {
      var i = slot(key)
      var target = -1
      while (keys(i) != null || dead(i)) {
        if (target < 0 && dead(i)) target = i
        i = (i + 1) & mask
      }
      if (target < 0) target = i
      if (dead(target)) { dead(target) = false; tombs -= 1 }
      keys(target) = key
      cnts(target) = c
      errs(target) = e
      used += 1
    }

    private def removeAt(i: Int): Unit = {
      keys(i) = null
      dead(i) = true
      used -= 1
      tombs += 1
      if (tombs > capacity) rehash()
    }

    private def rehash(): Unit = {
      val ks = keys.clone(); val cs = cnts.clone(); val es = errs.clone()
      java.util.Arrays.fill(keys.asInstanceOf[Array[AnyRef]], null)
      java.util.Arrays.fill(dead, false)
      tombs = 0
      used = 0
      var i = 0
      while (i < tableSize) {
        if (ks(i) != null) insert(ks(i), cs(i), es(i))
        i += 1
      }
    }

    /** Deterministic eviction victim: min (count, key), one array scan. */
    private def argmin: Int = {
      var best = -1
      var i = 0
      while (i < tableSize) {
        if (keys(i) != null &&
            (best < 0 || cnts(i) < cnts(best) ||
              (cnts(i) == cnts(best) && keys(i).compareTo(keys(best)) < 0)))
          best = i
        i += 1
      }
      best
    }

    /** The SpaceSaving step, in place. */
    private[ops] def add(item: String): Unit = {
      val i = find(item)
      if (i >= 0) cnts(i) += 1
      else if (used < capacity) insert(item, 1L, 0L)
      else {
        // evict the minimum counter; the newcomer inherits its count as
        // upper-bound error
        val m = argmin
        val minC = cnts(m)
        removeAt(m)
        insert(item, minC + 1, minC)
      }
    }

    /** A key absent from a FULL sketch could have been evicted at any
      * count up to the current minimum — that minimum is its count/error
      * floor in the merge. A non-full sketch never evicted: floor 0. */
    private[ops] def floor: Long =
      if (used < capacity) 0L
      else {
        var m = Long.MaxValue
        var i = 0
        while (i < tableSize) {
          if (keys(i) != null && cnts(i) < m) m = cnts(i)
          i += 1
        }
        m
      }

    private[ops] def entries: Iterator[(String, Long, Long)] =
      keys.indices.iterator.filter(i => keys(i) != null)
        .map(i => (keys(i), cnts(i), errs(i)))
  }

  class SpaceSaving(capacity: Int)
      extends Aggregator[String, SSBuffer, Seq[HeavyHitter]] {

    override def zero: SSBuffer = new SSBuffer(capacity)

    override def reduce(b: SSBuffer, item: String): SSBuffer = {
      // null tokens carry no frequency information — skip them (the open
      // addressing table hashes keys, so a null would NPE; the sketch's
      // guarantees are over the non-null stream)
      if (item != null) b.add(item)
      b
    }

    override def merge(a: SSBuffer, b: SSBuffer): SSBuffer = {
      // standard sketch merge: sum common counters; a key absent from one
      // side gets that side's floor added to both count and error (it
      // could have been evicted there at up to the floor). Truncation
      // back to capacity keeps the top counters, ties by key.
      val fa = a.floor
      val fb = b.floor
      val m = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
      a.entries.foreach { case (k, c, e) => m.update(k, (c + fb, e + fb)) }
      b.entries.foreach { case (k, c, e) =>
        m.get(k) match {
          case Some((c0, e0)) => m.update(k, (c0 - fb + c, e0 - fb + e))
          case None           => m.update(k, (fa + c, fa + e))
        }
      }
      val all = m.iterator.map { case (k, (c, e)) => (k, c, e) }.toSeq
      val kept =
        if (all.size <= capacity) all
        else all.sortBy { case (k, c, _) => (-c, k) }.take(capacity)
      val out = new SSBuffer(capacity)
      kept.foreach { case (k, c, e) => out.insert(k, c, e) }
      out
    }

    override def finish(b: SSBuffer): Seq[HeavyHitter] =
      b.entries.map { case (k, c, e) => HeavyHitter(k, c, e) }
        .toSeq.sortBy(h => (-h.cnt, h.item))

    override def bufferEncoder: Encoder[SSBuffer] = Encoders.kryo[SSBuffer]
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

  /** Merge MANY SpaceSaving summaries relationally — the DataFrame twin
    * of [[SpaceSaving.merge]]'s buffer arithmetic, for summaries that
    * live as (batchCol, item, cnt, err) ROWS (per-day partials, the
    * streaming landings of `StreamSink.toHeavyHitters`): a summary's
    * floor is its minimum count when FULL (0 when under capacity — no
    * key was ever evicted), an item absent from a summary contributes
    * that summary's floor to both its merged count and its merged error
    * (it could have been evicted there holding up to the floor), and
    * the merged table is truncated back to the top `capacity` counters
    * (ties by item — [[SpaceSaving.merge]]'s rule).
    *
    * `Σ_absent floor_j` is computed as `F − Σ_present floor_j` (F = the
    * global floor sum), so the plan never joins items against the
    * batch universe: one per-batch floor agg (tiny), one keyed item
    * agg with map-side partials, one broadcast 1-row join, one
    * TakeOrdered — no shuffle carries more than the distinct items.
    *
    * Exactness contract (spec-asserted): when every input summary is
    * exact (capacity ≥ its distinct items ⇒ floor 0, err 0), the merge
    * is the exact global count — the regime the oracle hash-checks;
    * in the approximate regime merged counts never undercount the true
    * stream (each absent side over-compensates by ≥ its possible
    * evicted mass) and `err` bounds the overcount, the Agarwal et al.
    * mergeable-summaries guarantee. */
  def ssMerge(summaries: DataFrame, batchCol: String, capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val floors = summaries.groupBy(col(batchCol).as("__b"))
      .agg(when(count(lit(1)) >= capacity, min(col("cnt")))
        .otherwise(lit(0L)).as("__floor"))
    val totalF = floors.agg(coalesce(sum(col("__floor")), lit(0L)).as("__f"))
    summaries.select(col(batchCol).as("__b"), col("item"), col("cnt"), col("err"))
      .join(floors, "__b")
      .groupBy(col("item"))
      .agg(sum(col("cnt")).as("__c"), sum(col("err")).as("__e"),
        sum(col("__floor")).as("__fp"))
      .crossJoin(broadcast(totalF))
      .select(col("item"),
        (col("__c") + col("__f") - col("__fp")).as("cnt"),
        (col("__e") + col("__f") - col("__fp")).as("err"))
      .orderBy(col("cnt").desc, col("item"))
      .limit(capacity)
  }

  /** KMV (k minimum values) distinct-count sketch — Bar-Yossef et al.,
    * "Counting distinct elements in a data stream" (RANDOM 2002): keep
    * the k SMALLEST distinct hash values of a key; the k-th smallest
    * h_k estimates the distinct count as (k−1)·M / h_k (hashes uniform
    * on [0, M)). Unlike HLL (q52, register-max merge), a KMV sketch is
    * fully expressible in relational algebra with an integer hash, so
    * the whole pipeline — sketch build, MERGE, estimate — is exactly
    * SQL-replayable, and merging is literally set-union-then-retake-k:
    * the property that lets per-partition / per-day sketches roll up
    * without rescanning anything.
    *
    * The hash is the seeded affine map `(a·x + b) mod P` (P = 2³¹−1;
    * a·x stays far under 2⁶³ for any realistic id, so the arithmetic
    * never relies on engine-specific overflow). Hash collisions fold
    * identically in every engine — the estimator sees hash-distinct,
    * which is the sketch's contract.
    *
    * Scale shape: one distinct aggregation (the only full shuffle,
    * map-side partials absorb repeats) + one k-bounded window per
    * group (parallelism = group count, state = top-k heap — never a
    * global sort). */
  val KmvP: Long = 2147483647L
  val KmvA: Long = 1103515245L
  val KmvB: Long = 12345L

  /** Seeded affine hash, TOTAL over every bigint key: the key is first
    * reduced mod P (pmod → canonical non-negative residue, so negative
    * keys don't leak Spark's sign-keeping `%` into the sketch), then
    * the affine map runs on a value < 2P — (2P)·A ≈ 2⁶² stays inside a
    * long for ANY input, where the raw `key·A` overflowed past ~8.4e9.
    * For keys already in [0, P) this is bit-identical to the plain
    * `(a·x + b) mod P`, and the SQL twin `(((x % P)·A + B) % P + P) % P`
    * is congruent for all keys (the m<0 branch differs by P·A ≡ 0). */
  def kmvHash(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(pmod(key, lit(KmvP)) * KmvA + KmvB, lit(KmvP))

  /** Per-group k-min set: (group, h, r) with r = rank of h among the
    * group's distinct hashes, r ≤ k. The mergeable sketch itself. */
  def kmvMinSet(df: DataFrame, groupCol: org.apache.spark.sql.Column,
      keyCol: org.apache.spark.sql.Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val kt = df.select(keyCol).schema.head.dataType
    require(Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType)(kt),
      s"KMV requires an integral key column (byte/short/int/long) so the " +
        s"affine hash is exact and SQL-replayable; got ${kt.catalogString}")
    val w = Window.partitionBy(col("grp")).orderBy(col("h"))
    df.select(groupCol.as("grp"), kmvHash(keyCol).as("h")).distinct()
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= k)
  }

  /** Mergeable uniform-SAMPLE sketch via bottom-k ROW hashing — the
    * QUANTILE member of the sketch family (distinct = [[kmvMinSet]],
    * frequency = [[cmSketch]], heavy hitters = [[SpaceSaving]]; the GK
    * sketch q53 serves is exact-rank but NOT mergeable): per group keep
    * the k rows whose seeded affine hash of a UNIQUE row id is
    * smallest. Hashing a unique id makes the kept rows a uniform random
    * sample of the group's rows (duplicated VALUES keep their
    * multiplicity — what a distinct-based sketch destroys and quantiles
    * require), and bottom-k by hash makes it MERGEABLE: bottom-k of a
    * union is bottom-k of the members' bottom-k's, so per-day /
    * per-partition sketches roll up without rescanning base data (the
    * q102/q127 property, extended from distinct counts to
    * distributions). Sample-quantile error is the classic
    * O(1/√k) in rank — documented, deterministic, SQL-replayable.
    * NULL values are excluded (nothing to rank). */
  def sampleSketch(df: DataFrame, groupCol: org.apache.spark.sql.Column,
      idCol: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"sample sketch needs k >= 2, got $k")
    val w = Window.partitionBy(col("grp")).orderBy(col("h"), col("v"))
    df.select(groupCol.as("grp"), kmvHash(idCol).as("h"), valueCol.as("v"))
      .filter(col("v").isNotNull)
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= k)
  }

  /** MERGE sample sketches under a new group label: union the member
    * rows (NEVER re-hash), re-take the k smallest by (h, v). Rows with
    * equal (h, v) are interchangeable, so the kept multiset — and every
    * quantile read off it — is deterministic on any engine. */
  def sampleMerge(sketch: DataFrame, newGroup: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp")).orderBy(col("h"), col("v"))
    sketch.select(lit(newGroup).as("grp"), col("h"), col("v"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= k)
  }

  /** Quantile estimates from sample sketches alone: for each φ (integer
    * percent) pick the sample value at nearest-rank-lower
    * `(φ·(m−1)) div 100 + 1` over the v-sorted sample (m = sample
    * size) — exact for groups smaller than k (the sample IS the group),
    * O(1/√k)-rank-accurate above. Integer rank arithmetic; the picked
    * value is COPIED, never computed, so estimates hash-match any
    * SQL replay bit-for-bit. */
  def sampleQuantiles(sketch: DataFrame, phis: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(phis.nonEmpty && phis.forall(p => p >= 0 && p <= 100),
      s"phis must be integer percents, got $phis")
    val w = Window.partitionBy(col("grp")).orderBy(col("v"), col("h"))
    val ranked = sketch
      .withColumn("vr", row_number().over(w))
      .withColumn("m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))))
    phis.map { p =>
      ranked.filter(col("vr") === expr(s"(($p * (m - 1)) div 100) + 1"))
        .select(col("grp"), lit(p.toLong).as("phi"), col("v").as("est"),
          col("m").cast("long").as("m"))
    }.reduce(_ unionAll _)
  }

  /** MERGE k-min sets into one sketch under a new group label: union of
    * the member sketches' RAW hash values (re-hashing would destroy the
    * estimator's uniformity), dedup, re-take the k smallest. Touches
    * only sketch rows — the per-partition / per-day rollup that never
    * rescans the base data. */
  def kmvMerge(minSets: DataFrame, newGroup: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp")).orderBy(col("h"))
    minSets.select(lit(newGroup).as("grp"), col("h")).distinct()
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= k)
  }

  /** Pairwise SET-OPERATION estimates from k-min sketches (Beyer et al.,
    * SIGMOD'07 — the property that makes KMV more than a counter): for
    * every unordered group pair (a, b), the K smallest distinct hashes
    * of the UNION of the two sketches form a valid sketch of A∪B, and
    * the fraction of them present in BOTH sketches estimates the
    * Jaccard similarity — so intersection sizes and overlap coefficients
    * of arbitrary group pairs come from the sketch rows ALONE, never a
    * rescan of base data (the audience-overlap / segment-intersection
    * query shape). All arithmetic integer and truncating:
    * `K = min(k, |union hashes|)`, `matches = |hashes in both|` among
    * the K smallest, `union_est` exact while unsaturated else
    * `(K−1)·P div h_K`, `inter_est = matches·union_est div K`,
    * `jaccard6 = matches·1e6 div K` — bit-replayable in any SQL engine.
    *
    * Scale shape: input is sketch rows (≤ k per group); the pair frame
    * is |pairs|·≤2k rows — metadata-sized however big the base corpus —
    * one union aggregation + one k-bounded window per pair. */
  def kmvPairStats(minSets: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val g = minSets.select(col("grp")).distinct()
    val pg = g.select(col("grp").as("ga"))
      .join(g.select(col("grp").as("gb")), col("ga") < col("gb"))
    val ua = pg.join(minSets.select(col("grp").as("ga"), col("h")), "ga")
      .select(col("ga"), col("gb"), col("h"),
        lit(1L).as("ina"), lit(0L).as("inb"))
    val ub = pg.join(minSets.select(col("grp").as("gb"), col("h")), "gb")
      .select(col("ga"), col("gb"), col("h"),
        lit(0L).as("ina"), lit(1L).as("inb"))
    val u = ua.unionAll(ub)
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val cw = Window.partitionBy(col("ga"), col("gb"))
    val ranked = u.withColumn("r", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(cw))
      .withColumn("kk", least(col("cnt"), lit(k.toLong)))
      .filter(col("r") <= col("kk"))
    ranked.groupBy(col("ga"), col("gb"))
      .agg(max(col("kk")).as("kk"),
        sum(col("ina") * col("inb")).as("matches"),
        max(when(col("r") === col("kk"), col("h"))).as("hk"),
        max(col("cnt")).as("cnt"))
      .select(col("ga"), col("gb"), col("kk").as("k_used"), col("matches"),
        when(col("cnt") < k, col("cnt"))
          .otherwise(expr(s"${(k - 1).toLong * KmvP} div hk")).as("union_est"))
      .withColumn("inter_est",
        expr("(matches * union_est) div k_used"))
      .withColumn("jaccard6", expr("(matches * 1000000) div k_used"))
  }

  /** Distinct-count estimates from a k-min set: one row per group,
    * `(grp, m, est)` where m = |sketch| and est = m exactly while the
    * sketch is unsaturated (m < k — the sketch HOLDS every distinct
    * hash) and the (k−1)·M div h_k estimator once saturated. Integer
    * arithmetic end to end. */
  def kmvEstimate(minSet: DataFrame, k: Int): DataFrame =
    minSet.groupBy(col("grp"))
      .agg(count(lit(1)).as("m"),
        max(when(col("r") === k, col("h"))).as("hk"))
      .select(col("grp"), col("m"),
        when(col("m") < k, col("m"))
          .otherwise(expr(s"${(k - 1).toLong * KmvP} div hk")).as("est"))

  // ---------------------------------------------------------------------
  // Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005): the
  // mergeable FREQUENCY counterpart of KMV's distinct counter. depth
  // independent hash rows × width cells; each occurrence increments one
  // cell per row; the point estimate is the MIN over rows of the key's
  // cells — never an undercount, over by at most the collision mass
  // (≤ 2n/width with probability 1 − (1/2)^depth). Sketches of disjoint
  // streams MERGE by cell-wise addition, so per-partition / per-day
  // frequency tables roll up without rescanning base data — the
  // "how often does this token/domain/user appear, per shard and
  // overall" query at any corpus scale.
  //
  // Hashes are the seeded total affine family h_i(x) =
  // ((x pmod P)·(A + i·CmStep) + B + i) pmod P pmod width — the kmvHash
  // construction per row i, integer end-to-end and SQL-replayable.
  // Overflow bound: the product (reduced key < P ≈ 2^31) × multiplier
  // must stay inside a long, so the multiplier A + i·CmStep must stay
  // < 2^32 — true for i ≤ 3191; depth is capped at 3000 with margin
  // (beyond that the long silently wraps and the sketch diverges from
  // any exact SQL replay).
  // ---------------------------------------------------------------------

  val CmStep: Long = 1000003L

  /** Cell coordinate of `key` in hash row `row` (both Columns). */
  def cmHash(key: org.apache.spark.sql.Column,
      row: org.apache.spark.sql.Column, width: Int): org.apache.spark.sql.Column =
    pmod(pmod(pmod(key, lit(KmvP)) * (lit(KmvA) + row * CmStep) + KmvB + row,
      lit(KmvP)), lit(width.toLong))

  /** Per-group Count-Min sketch in sparse form: (grp, row, cell, cnt)
    * with one record per NON-EMPTY cell (cnt ≥ 1 by construction, so
    * sparse and dense estimates agree via the left-join-coalesce in
    * [[cmEstimate]]). ONE shuffle of depth× the input rows, with
    * map-side partial aggregation absorbing repeated keys before the
    * exchange — heavy keys cost one partial counter per task, not one
    * shuffled row per occurrence. */
  def cmSketch(df: DataFrame, groupCol: org.apache.spark.sql.Column,
      keyCol: org.apache.spark.sql.Column, depth: Int, width: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(depth >= 1 && depth <= 3000,
      s"depth must be in [1, 3000] (affine-hash overflow bound), got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val kt = df.select(keyCol).schema.head.dataType
    require(Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType)(kt),
      s"Count-Min requires an integral key column so the affine hash " +
        s"family is exact and SQL-replayable; got ${kt.catalogString}")
    df.select(groupCol.as("grp"), keyCol.cast("long").as("k"))
      .withColumn("row", explode(sequence(lit(0L), lit(depth.toLong - 1))))
      .groupBy(col("grp"), col("row"), cmHash(col("k"), col("row"), width).as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** JOIN-SIZE estimation from two Count-Min sketches (the
    * Alon–Gibbons–Matias–Szegedy / Cormode–Muthukrishnan inner-product
    * result: for each hash row r, Σ_w c₁[r][w]·c₂[r][w] ≥ |A ⋈ B| on
    * the sketched key, and the MIN over rows is the estimate — never an
    * undercount): the cardinality-planning statistic that prices a join
    * WITHOUT scanning either input, from two ≤ depth·width cell tables
    * maintained at ingest (q112/q124). Sparse cells make the product a
    * plain equi-join on (row, cell); a depth row with NO colliding
    * cells has inner product 0, which forces the estimate (and the
    * truth) to 0 — the densify guard below (`nr < depth`) restores
    * exactly that case the sparse join cannot emit. Output one row per
    * (grp_a, grp_b) sketch pair: `est`. */
  def cmJoinSize(sk1: DataFrame, sk2: DataFrame, depth: Int): DataFrame = {
    val a = sk1.select(col("grp").as("grp_a"), col("row"), col("cell"),
      col("cnt").as("__ca"))
    val b = sk2.select(col("grp").as("grp_b"), col("row"), col("cell"),
      col("cnt").as("__cb"))
    val hit = a.join(b, Seq("row", "cell"))
      .groupBy(col("grp_a"), col("grp_b"), col("row"))
      .agg(sum(col("__ca") * col("__cb")).as("__ip"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(min(col("__ip")).as("__minip"), count(lit(1)).as("__nr"))
    // densify over the sketch-pair universe: a pair whose cells never
    // collide (disjoint key sets at this width) produces NO joined row
    // at all, yet its estimate is a hard 0 — the ≤|groups|² pair frame
    // restores it (broadcast; group sets are sketch metadata, tiny)
    val pairs = sk1.select(col("grp").as("grp_a")).distinct()
      .crossJoin(broadcast(sk2.select(col("grp").as("grp_b")).distinct()))
    pairs.join(hit, Seq("grp_a", "grp_b"), "left")
      .select(col("grp_a"), col("grp_b"),
        when(col("__nr").isNull || col("__nr") < depth, lit(0L))
          .otherwise(col("__minip")).as("est"))
  }

  /** Cell-wise merge of Count-Min sketches (all built with the SAME
    * depth/width) under a new group label. Touches only sketch rows —
    * ≤ depth·width per input group regardless of base-data size. */
  def cmMerge(sketches: DataFrame, newGroup: String): DataFrame =
    sketches.groupBy(lit(newGroup).as("grp"), col("row"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point frequency estimates: for every (group in `sketch`) × (key in
    * `keys`' column `k`), est = min over hash rows of the key's cell
    * count (0 if the cell is empty — the sparse representation's
    * absent-cell case). The probe frame is |keys|·|groups|·depth rows
    * joined against the ≤ depth·width-bounded sketch — metadata-sized
    * both sides, broadcast-friendly, never a rescan of base data. */
  def cmEstimate(sketch: DataFrame, keys: DataFrame, depth: Int,
      width: Int): DataFrame = {
    val grps = sketch.select(col("grp")).distinct()
    keys.select(col("k").cast("long").as("k"))
      .crossJoin(broadcast(grps))
      .withColumn("row", explode(sequence(lit(0L), lit(depth.toLong - 1))))
      .withColumn("cell", cmHash(col("k"), col("row"), width))
      .join(sketch, Seq("grp", "row", "cell"), "left")
      .groupBy(col("grp"), col("k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
