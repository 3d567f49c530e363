package graft.ops

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.ops.Sketches.SpaceSaving

class SketchesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // zipf-ish stream: "w1" x 100, "w2" x 50, "w3" x 25, ..., 40 rare singletons
  private val stream: Seq[String] =
    (1 to 5).flatMap(i => Seq.fill(200 / (1 << i))(s"w$i")) ++
      (1 to 40).map(i => s"rare$i")
  private val exact: Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("exact when capacity >= distinct items (the q44 regime)") {
    val hh = Sketches.heavyHitters(stream.toDF("item"), "item", capacity = 64)
      .as[(String, Long, Long)].collect()
    assert(hh.map(h => h._1 -> h._2).toMap == exact)
    assert(hh.forall(_._3 == 0L), "no evictions -> no error")
  }

  test("null tokens are skipped, not counted and not a crash") {
    val hh = Sketches.heavyHitters(
      (stream.map(Option(_)) ++ Seq.fill(10)(None)).toDF("item"),
      "item", capacity = 64).as[(String, Long, Long)].collect()
    assert(hh.map(h => h._1 -> h._2).toMap == exact,
      "null rows must not perturb non-null counts")
  }

  test("SpaceSaving bound: count overestimates by at most err, true <= reported") {
    val agg = new SpaceSaving(8)
    val st = stream.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(st)
    out.foreach { h =>
      val t = exact.getOrElse(h.item, 0L)
      assert(h.cnt >= t, s"${h.item}: reported ${h.cnt} < true $t")
      assert(h.cnt - h.err <= t, s"${h.item}: ${h.cnt} - ${h.err} > true $t")
    }
  }

  test("items above n/capacity are guaranteed present") {
    val agg = new SpaceSaving(8)
    val st = stream.foldLeft(agg.zero)(agg.reduce)
    val kept = agg.finish(st).map(_.item).toSet
    val n = stream.size
    exact.collect { case (k, c) if c > n / 8 => k }
      .foreach(k => assert(kept.contains(k), s"heavy item $k evicted"))
  }

  test("built-in sketches: HLL++ distinct count and t-digest percentile tolerances") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    import org.apache.spark.sql.functions._
    val exactD = ev.select(countDistinct(col("user_id"))).head.getLong(0)
    val approxD = ev.select(approx_count_distinct(col("user_id"), 0.02)).head.getLong(0)
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05,
      s"HLL++ $approxD vs exact $exactD")
    val exactP = ev.stat.approxQuantile("value", Array(0.5), 0.0).head
    val approxP = ev.stat.approxQuantile("value", Array(0.5), 0.01).head
    val spread = ev.select(max(col("value")) - min(col("value"))).head.getDouble(0)
    assert(math.abs(approxP - exactP) / spread < 0.05,
      s"approx median $approxP vs exact $exactP")
  }

  test("q52/q53 exact-regime contracts: HLL 4-sigma bound, GK element at rank ceil(p*n)") {
    import org.apache.spark.sql.functions._
    // known cardinality 5000, skewed multiplicities
    val df = (1 to 5000).flatMap(i => Seq.fill(1 + i % 3)(i.toLong)).toDF("x")
    Seq(0.01, 0.02, 0.05).foreach { rsd =>
      val est = df.select(approx_count_distinct(col("x"), rsd)).head.getLong(0)
      assert(math.abs(est - 5000.0) <= 4 * rsd * 5000,
        s"HLL rsd=$rsd est=$est outside 4-sigma of 5000")
    }
    // GK at accuracy >= n: the returned element sits at rank ceil(p*n)
    // (the convention q53's oracle replays)
    val vals = df.select(col("x").cast("double")).collect().map(_.getDouble(0)).sorted
    val n = vals.length
    Seq(0.1, 0.25, 0.5, 0.9, 0.95).foreach { p =>
      val got = df.select(
        percentile_approx(col("x").cast("double"), lit(p), lit(1000000)))
        .head.getDouble(0)
      assert(got == vals(math.ceil(p * n).toInt - 1),
        s"GK p=$p got $got, expected rank-ceil(p*n) element ${vals(math.ceil(p * n).toInt - 1)}")
    }
    // GK at coarse accuracy: rank error bounded by n/accuracy
    val acc = 100
    Seq(0.25, 0.5, 0.9).foreach { p =>
      val got = df.select(
        percentile_approx(col("x").cast("double"), lit(p), lit(acc)))
        .head.getDouble(0)
      val rank = vals.indexOf(got)
      assert(rank >= 0 && math.abs(rank + 1 - p * n) <= 2.0 * n / acc,
        s"GK acc=$acc p=$p rank ${rank + 1} vs target ${p * n}")
    }
  }

  test("merge is a valid sketch combine (bounds hold across partitions)") {
    val agg = new SpaceSaving(8)
    val (s1, s2) = stream.splitAt(stream.size / 3)
    val merged = agg.merge(
      s1.foldLeft(agg.zero)(agg.reduce),
      s2.foldLeft(agg.zero)(agg.reduce))
    val out = agg.finish(merged)
    assert(out.size <= 8)
    out.foreach { h =>
      val t = exact.getOrElse(h.item, 0L)
      assert(h.cnt >= t && h.cnt - h.err <= t, s"${h.item}: ${h.cnt}±${h.err} vs $t")
    }
    // the dominant item survives any split
    assert(out.map(_.item).contains("w1"))
  }

  test("KMV: exact below saturation, estimator within tolerance above it") {
    import spark.implicits._
    val k = 64
    // 20 distinct ids < k: the sketch holds every hash -> m == est == 20
    val small = (1L to 20L).map(i => ("a", i)).toDF("g", "id")
    val smallEst = Sketches.kmvEstimate(
      Sketches.kmvMinSet(small, col("g"), col("id"), k), k)
      .as[(String, Long, Long)].collect().toSeq
    assert(smallEst == Seq(("a", 20L, 20L)))
    // 10k distinct ids >> k: estimate within the sketch's error regime
    // (std error ~ 1/sqrt(k-1) ~ 12.6%; 3 sigma ~ 38%)
    val big = (1L to 10000L).map(i => ("b", i)).toDF("g", "id")
    val Seq((_, m, est)) = Sketches.kmvEstimate(
      Sketches.kmvMinSet(big, col("g"), col("id"), k), k)
      .as[(String, Long, Long)].collect().toSeq
    assert(m == k.toLong)
    assert(est > 6200 && est < 13800, s"estimate $est for true 10000")
  }

  test("kmvHash is total: negative and huge keys land in [0,P) and match BigInt") {
    import spark.implicits._
    val keys = Seq(-1L, -2147483648L, Long.MinValue, Long.MaxValue,
      8400000000L, 0L, 42L, 2147483646L)
    val got = keys.toDF("id")
      .select(col("id"), Sketches.kmvHash(col("id")).as("h"))
      .as[(Long, Long)].collect().toMap
    keys.foreach { key =>
      val ref = ((BigInt(key) * Sketches.KmvA + Sketches.KmvB)
        .mod(BigInt(Sketches.KmvP))).toLong
      assert(got(key) == ref, s"key $key: got ${got(key)}, want $ref")
      assert(got(key) >= 0L && got(key) < Sketches.KmvP)
    }
  }

  test("kmvMinSet rejects non-integral key columns at call time") {
    import spark.implicits._
    val df = Seq(("a", "not-a-number")).toDF("g", "id")
    val e = intercept[IllegalArgumentException] {
      Sketches.kmvMinSet(df, col("g"), col("id"), 8)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("kmvPairStats: exact intersection/union/Jaccard below saturation") {
    import spark.implicits._
    val k = 64
    // A = 1..30, B = 21..50 (|A∩B| = 10, |A∪B| = 50), C disjoint 100..119
    val df = ((1L to 30L).map(("A", _)) ++ (21L to 50L).map(("B", _)) ++
      (100L to 119L).map(("C", _))).toDF("g", "id")
    val sk = Sketches.kmvMinSet(df, col("g"), col("id"), k)
    val out = Sketches.kmvPairStats(sk, k)
      .select(col("ga"), col("gb"), col("k_used"), col("matches"),
        col("union_est"), col("inter_est"), col("jaccard6"))
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // all sets fit below k: sketches are exact, so estimates are exact
    val ab = out(("A", "B"))
    assert(ab._3 == 50L && ab._4 == 10L && ab._5 == 50L && ab._6 == 10L)
    assert(ab._7 == 10L * 1000000L / 50L)
    val ac = out(("A", "C"))
    assert(ac._4 == 0L && ac._5 == 50L && ac._6 == 0L && ac._7 == 0L)
    assert(out.size == 3)
  }

  test("kmvPairStats: saturated union estimate stays in the error regime") {
    import spark.implicits._
    val k = 64
    // two half-overlapping 5000-element sets: |A∪B| = 7500, J = 1/3
    val df = ((1L to 5000L).map(("A", _)) ++
      (2501L to 7500L).map(("B", _))).toDF("g", "id")
    val sk = Sketches.kmvMinSet(df, col("g"), col("id"), k)
    val Seq((ku, u, j)) = Sketches.kmvPairStats(sk, k)
      .select(col("k_used"), col("union_est"), col("jaccard6"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(ku == k.toLong)
    // std error ~ 1/sqrt(k-1) ~ 12.6%; allow 3 sigma
    assert(u > 4600 && u < 10400, s"union est $u for true 7500")
    assert(j > 80000 && j < 600000, s"jaccard6 $j for true 333333")
  }

  test("KMV merge of per-group sketches equals the direct sketch of the union") {
    import spark.implicits._
    val k = 16
    val df = (1L to 500L).map(i => (s"g${i % 5}", i)).toDF("g", "id")
    val perGroup = Sketches.kmvMinSet(df, col("g"), col("id"), k)
    val merged = Sketches.kmvMerge(perGroup, "all", k)
      .as[(String, Long, Long)].collect().sortBy(_._3).toSeq
    val direct = Sketches.kmvMinSet(df.withColumn("g", lit("all")),
        col("g"), col("id"), k)
      .as[(String, Long, Long)].collect().sortBy(_._3).toSeq
    // any globally-k-smallest hash is also among its own group's k
    // smallest, so the union of sketches contains the direct k-min set
    assert(merged == direct && direct.size == k)
  }

  test("Count-Min: never undercounts; exact when width avoids collisions") {
    import spark.implicits._
    val d = 3
    val df = (1L to 400L).map(i => ("g", i % 23)).toDF("g", "id")
    val exact = df.groupBy(col("id")).count()
      .as[(Long, Long)].collect().toMap
    val keys = exact.keys.toSeq.toDF("k")
    for (w <- Seq(8, 4096)) {
      val sk = Sketches.cmSketch(df, col("g"), col("id"), d, w)
      val est = Sketches.cmEstimate(sk, keys, d, w)
        .as[(String, Long, Long)].collect()
      est.foreach { case (_, k, e) =>
        assert(e >= exact(k), s"w=$w undercount key $k: $e < ${exact(k)}") }
      if (w == 4096) // 23 keys in 4096 cells: this seed family collides nowhere
        est.foreach { case (_, k, e) =>
          assert(e == exact(k), s"w=$w key $k: $e != ${exact(k)}") }
    }
  }

  test("Count-Min merge of per-group sketches equals the direct union sketch") {
    import spark.implicits._
    val d = 3; val w = 64
    val df = (1L to 600L).map(i => (s"g${i % 4}", i % 37)).toDF("g", "id")
    val perGroup = Sketches.cmSketch(df, col("g"), col("id"), d, w)
    val merged = Sketches.cmMerge(perGroup, "all")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._2, r._3)).toSeq
    val direct = Sketches.cmSketch(df.withColumn("g", lit("all")),
        col("g"), col("id"), d, w)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._2, r._3)).toSeq
    assert(merged == direct)
  }

  test("Count-Min: absent keys estimate 0 when their cells are empty") {
    import spark.implicits._
    val d = 3; val w = 65536
    // a single present key, probes far away: with width >> keys the
    // probe cells are empty in at least one row and min(coalesce)=0
    val df = Seq(("g", 7L)).toDF("g", "id")
    val sk = Sketches.cmSketch(df, col("g"), col("id"), d, w)
    val est = Sketches.cmEstimate(sk, Seq(900001L, 900002L).toDF("k"), d, w)
      .as[(String, Long, Long)].collect()
    est.foreach { case (_, k, e) => assert(e == 0L, s"key $k est $e") }
  }

  test("cmSketch rejects non-integral key columns at call time") {
    import spark.implicits._
    val df = Seq(("g", "x")).toDF("g", "id")
    val e = intercept[IllegalArgumentException] {
      Sketches.cmSketch(df, col("g"), col("id"), 3, 64)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("sample sketch: merge over sketch rows equals the direct sketch of the union") {
    val rnd = new scala.util.Random(0x5A3157L)
    val rows = (1L to 500L).map(id =>
      (s"g${id % 3}", id, rnd.nextDouble() * 100))
    val df = rows.toDF("g", "id", "v")
    val k = 16
    val perGroup = Sketches.sampleSketch(df, col("g"), col("id"), col("v"), k)
    val merged = Sketches.sampleMerge(perGroup, "__all", k)
      .select($"h", $"v").as[(Long, Double)].collect().toSeq.sorted
    val direct = Sketches.sampleSketch(df, lit("__all"), col("id"), col("v"), k)
      .select($"h", $"v").as[(Long, Double)].collect().toSeq.sorted
    assert(merged == direct && merged.size == k)
  }

  test("sample sketch: quantiles are EXACT for groups smaller than k") {
    val vs = Seq(5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0) // 1..9 shuffled
    val df = vs.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("g", "id", "v")
    val sk = Sketches.sampleSketch(df, col("g"), col("id"), col("v"), k = 64)
    val q = Sketches.sampleQuantiles(sk, Seq(0, 50, 100))
      .select($"phi", $"est").as[(Long, Double)].collect().toMap
    // nearest-rank-lower over 9 values 1..9: phi 0 -> 1, 50 -> 5, 100 -> 9
    assert(q == Map(0L -> 1.0, 50L -> 5.0, 100L -> 9.0))
  }

  test("sample sketch: NULL values excluded; sample size capped at k") {
    val df = ((1L to 100L).map(id => ("g", id, Some(id.toDouble))) :+
      (("g", 101L, Option.empty[Double]))).toDF("g", "id", "v")
    val sk = Sketches.sampleSketch(df, col("g"), col("id"), col("v"), k = 8)
    assert(sk.count() == 8L)
    val m = Sketches.sampleQuantiles(sk, Seq(50))
      .select($"m").as[Long].head()
    assert(m == 8L)
  }

  test("ssMerge: exact regime equals the plain count; truncation keeps " +
    "the top-capacity by (cnt desc, item)") {
    val items = (1L to 400L).map(i => s"w${i % 20}")
    val parts = items.grouped(150).toSeq
    val summaries = parts.zipWithIndex.map { case (p, i) =>
      Sketches.heavyHitters(p.toDF("item"), "item", capacity = 32)
        .withColumn("batch", lit(i.toLong))
    }.reduce(_ unionByName _)
    val merged = Sketches.ssMerge(summaries, "batch", capacity = 32)
      .as[(String, Long, Long)].collect().toSeq
    val truth = items.groupBy(identity).map { case (k, v) => (k, v.size.toLong, 0L) }
    assert(merged.toSet == truth.toSet)
    // truncation: capacity below the distinct count keeps the top
    // counters with the (cnt desc, item) tie order
    val trunc = Sketches.ssMerge(summaries, "batch", capacity = 5)
      .as[(String, Long, Long)].collect().toSeq
    val expect = truth.toSeq.sortBy { case (k, c, _) => (-c, k) }.take(5)
    assert(trunc.map(r => (r._1, r._2)) == expect.map(r => (r._1, r._2)))
  }

  test("ssMerge: approximate regime never undercounts; cnt - err bounds " +
    "the true count from below (seeded)") {
    val rnd = new scala.util.Random(0xC0FFEEL)
    // skewed stream over ~60 distinct keys, capacity far below
    val items = (1 to 3000).map(_ =>
      "k" + (math.pow(rnd.nextDouble(), 3.0) * 60).toInt)
    val cap = 8
    val parts = items.grouped(700).toSeq
    val summaries = parts.zipWithIndex.map { case (p, i) =>
      Sketches.heavyHitters(p.toDF("item"), "item", capacity = cap)
        .withColumn("batch", lit(i.toLong))
    }.reduce(_ unionByName _)
    val merged = Sketches.ssMerge(summaries, "batch", cap)
      .as[(String, Long, Long)].collect().toSeq
    assert(merged.nonEmpty && merged.size <= cap)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    merged.foreach { case (k, cnt, err) =>
      val t = truth.getOrElse(k, 0L)
      assert(cnt >= t, s"$k merged $cnt undercounts true $t")
      assert(cnt - err <= t, s"$k guaranteed mass ${cnt - err} exceeds true $t")
    }
    // the heaviest true key must survive the merge (the sketch's point)
    val top = truth.toSeq.maxBy(_._2)._1
    assert(merged.exists(_._1 == top))
  }

  test("cmJoinSize: never undercounts, exact at collision-free width, " +
      "disjoint keys estimate 0") {
    import org.apache.spark.sql.functions.{col, lit}
    val d = 3
    val aRows = (1 to 50).flatMap(i => Seq.fill(i % 3 + 1)(i.toLong))
    val bRows = (30 to 80).flatMap(i => Seq.fill(i % 2 + 1)(i.toLong))
    val a = aRows.toDF("k")
    val b = bRows.toDF("k")
    val exact = {
      val ca = aRows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = bRows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      ca.keysIterator.map(k => ca(k) * cb.getOrElse(k, 0L)).sum
    }
    for (w <- Seq(8, 64, 4096)) {
      val est = Sketches.cmJoinSize(
        Sketches.cmSketch(a, lit("a"), col("k"), d, w),
        Sketches.cmSketch(b, lit("b"), col("k"), d, w), d)
        .collect().head.getLong(2)
      assert(est >= exact, s"w=$w undercounts: $est < $exact")
      if (w == 4096) assert(est == exact, s"collision-free width: $est != $exact")
    }
    // disjoint key ranges at collision-free width: estimate must be 0
    val c = (1000L to 1010L).toDF("k")
    val z = Sketches.cmJoinSize(
      Sketches.cmSketch(a, lit("a"), col("k"), d, 4096),
      Sketches.cmSketch(c, lit("c"), col("k"), d, 4096), d)
      .collect().head.getLong(2)
    assert(z == 0L)
  }
}
