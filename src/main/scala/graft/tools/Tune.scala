package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev utility: A/B timing of alternative physical formulations for the
  * slowest bench queries (run manually, not part of the driver contract). */
object Tune {
  def time(name: String)(f: => Long): Unit = {
    // warm once, median of 3
    f
    val ts = Seq.fill(3) {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[tune] $name%-32s ${ts(1)}%7.3f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.types.DecimalType
    def table(n: String): DataFrame = graft.queries.Queries.table(spark, dir, n)

    // ---- q08 variants ---------------------------------------------------
    val cut = "1998-07-01"
    def q08(bcast: Boolean): Long = {
      val c0 = table("customer").filter(col("c_mktsegment") === "BUILDING")
      val c = if (bcast) broadcast(c0) else c0
      val o = table("orders").filter(col("o_orderdate") < lit(cut).cast("timestamp"))
      val l = table("lineitem").filter(col("l_shipdate") > lit(cut).cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(graft.ops.BarOps.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10).count()
    }
    time("q08 as-is")(q08(false))
    time("q08 broadcast(c)")(q08(true))

    // ---- q13 variants ---------------------------------------------------
    def q13Setops(): Long = {
      val ok = table("orders").select(col("o_orderkey").as("okey"))
      val lk = table("lineitem").select(col("l_orderkey").as("okey"))
      val both = ok.intersect(lk).withColumn("tag", lit("both"))
      val only = ok.except(lk).withColumn("tag", lit("orders_only"))
      both.union(only).orderBy("okey", "tag").count()
    }
    def q13Join(): Long = {
      val ok = table("orders").select(col("o_orderkey").as("okey")).distinct()
      val lk = table("lineitem").select(col("l_orderkey").as("okey")).distinct()
      ok.join(lk.withColumn("m", lit(1)), Seq("okey"), "left_outer")
        .select(col("okey"),
          when(col("m").isNotNull, lit("both")).otherwise(lit("orders_only")).as("tag"))
        .orderBy("okey", "tag").count()
    }
    time("q13 intersect/except")(q13Setops())
    time("q13 distinct+join")(q13Join())

    // ---- q30 variants ---------------------------------------------------
    val allTables = Seq("customer", "documents", "embeddings", "events",
      "lineitem", "nation", "orders", "part", "region", "supplier")
    def q30(v2: Boolean): Long = {
      val prev = spark.conf.get("spark.sql.sources.useV1SourceList")
      if (v2) spark.conf.set("spark.sql.sources.useV1SourceList", "")
      try allTables.map(t =>
          table(t).agg(count(lit(1)).as("n")).select(lit(t).as("tbl"), col("n")))
        .reduce(_.union(_)).orderBy("tbl").count()
      finally spark.conf.set("spark.sql.sources.useV1SourceList", prev)
    }
    time("q30 v1 scans")(q30(false))
    try time("q30 v2 agg pushdown")(q30(true))
    catch { case e: Throwable => println(s"[tune] q30 v2 FAILED: ${e.getMessage.take(200)}") }

    // ---- q10 variants ---------------------------------------------------
    def q10(bcastOrders: Boolean): Long = {
      val perOrder = table("lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6))).as("o_rev"))
      val o = table("orders").select(col("o_orderkey"), col("o_custkey"))
      val joined =
        if (bcastOrders) perOrder.join(broadcast(o), col("o_orderkey") === col("l_orderkey"))
        else o.join(perOrder, col("o_orderkey") === col("l_orderkey"))
      joined.groupBy(col("o_custkey"))
        .agg(sum(col("o_rev")).cast("double").as("revenue"), count(lit(1)).as("n_orders"))
        .filter(col("n_orders") > 5)
        .orderBy(col("revenue").desc, col("o_custkey"))
        .limit(10).count()
    }
    time("q10 as-is")(q10(false))
    time("q10 broadcast orders")(q10(true))
    // stage decomposition: is the cost compute or AQE stage scheduling?
    def q10PerOrderOnly(): Long = table("lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 6))).as("o_rev")).count()
    def q10DoubleSum(): Long = {
      // same shape, plain double sum (order-dependent, NOT oracle-safe):
      // isolates what the exact decimal accumulation costs
      val perOrder = table("lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("o_rev"))
      table("orders")
        .join(perOrder, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_rev")).as("revenue"), count(lit(1)).as("n_orders"))
        .filter(col("n_orders") > 5)
        .orderBy(col("revenue").desc, col("o_custkey"))
        .limit(10).count()
    }
    time("q10 perOrder agg only")(q10PerOrderOnly())
    time("q10 double-sum variant")(q10DoubleSum())

    // ---- q20 variants ---------------------------------------------------
    import graft.functions.TextFunctions._
    graft.functions.CatalystExpressions.register(spark)
    def q20(pairGen: String): Long = {
      val docs = table("documents")
      val k = 128; val bands = 32; val r = k / bands; val threshold = 0.8
      val withSets = docs.select(col("doc_id").as("id"),
        wordShingles(col("text"), 3).as("sh"))
      val withSig = withSets.withColumn("sig",
        call_function("graft_minhash", col("sh"), lit(k)))
      val bandsDf = withSig.select(col("id"), posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("sig"), b * r + 1, lit(r))))))
        .select(col("id"), col("pos").as("band"), col("col").as("band_key"))
      val cand = pairGen match {
        case "selfjoin" =>
          bandsDf.as("x").join(bandsDf.as("y"),
              col("x.band") === col("y.band") &&
              col("x.band_key") === col("y.band_key") &&
              col("x.id") < col("y.id"))
            .select(col("x.id").as("da"), col("y.id").as("db"))
            .distinct()
        case "collect" =>
          bandsDf.groupBy(col("band"), col("band_key"))
            .agg(sort_array(collect_list(col("id"))).as("ids"))
            .filter(size(col("ids")) > 1)
            .select(explode(expr(
              "flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), b -> struct(a as da, b as db))))")).as("p"))
            .select(col("p.da"), col("p.db"))
            .distinct()
      }
      val sets = withSets.select(col("id"), col("sh"))
      cand
        .join(sets.select(col("id").as("da"), col("sh").as("sa")), "da")
        .join(sets.select(col("id").as("db"), col("sh").as("sb")), "db")
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
        .withColumn("jac", col("inter") / (size(col("sa")) + size(col("sb")) - col("inter")))
        .filter(col("jac") >= threshold)
        .select(col("da"), col("db"), round(col("jac"), 6).as("jac"))
        .orderBy("da", "db").count()
    }
    time("q20 selfjoin pairs")(q20("selfjoin"))
    time("q20 collect_list pairs")(q20("collect"))

    // ---- q44 SpaceSaving reduce-loop micro-bench -------------------------
    // round-2 immutable-Map buffer (Map.updated per row, boxed minBy per
    // eviction) vs the mutable open-addressing SSBuffer, driver-side over
    // the real token stream. cap=64 is the q44 exact regime (no
    // evictions); cap=16 forces the eviction-heavy regime.
    val toks = table("documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .select(col("t").cast("string")).collect().map(_.getString(0))
    println(s"[tune] q44 token stream: ${toks.length} items")
    def ssOld(capacity: Int): Long = {
      var st = Map.empty[String, (Long, Long)]
      toks.foreach { item =>
        st = st.get(item) match {
          case Some((c, e)) => st.updated(item, (c + 1, e))
          case None if st.size < capacity => st.updated(item, (1L, 0L))
          case None =>
            val (minItem, (minC, _)) = st.minBy { case (k, (c, _)) => (c, k) }
            (st - minItem).updated(item, (minC + 1, minC))
        }
      }
      st.size.toLong
    }
    def ssNew(capacity: Int): Long = {
      val agg = new graft.ops.Sketches.SpaceSaving(capacity)
      val b = toks.foldLeft(agg.zero)(agg.reduce)
      agg.finish(b).size.toLong
    }
    time("q44 reduce imm-Map cap=64")(ssOld(64))
    time("q44 reduce SSBuffer cap=64")(ssNew(64))
    time("q44 reduce imm-Map cap=16")(ssOld(16))
    time("q44 reduce SSBuffer cap=16")(ssNew(16))

    // ---- q05 write variants ---------------------------------------------
    val scratch = graft.queries.Queries.scratchRoot + "/tune-q05"
    def q05(shape: String): Long = {
      val li0 = table("lineitem").select(col("l_returnflag"), col("l_quantity"))
      val li = shape match {
        case "asis"    => li0
        case "coalesce" => li0.coalesce(4)
        case "repart"  => li0.repartition(col("l_returnflag"))
      }
      li.write.mode("overwrite").option("compression", "none")
        .partitionBy("l_returnflag").parquet(scratch)
      li.write.mode("append").option("compression", "none")
        .partitionBy("l_returnflag").parquet(scratch)
      spark.read.parquet(scratch)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n")).count()
    }
    time("q05 as-is")(q05("asis"))
    time("q05 coalesce(4)")(q05("coalesce"))
    time("q05 repartition(flag)")(q05("repart"))

    // ---- IVF codebook size sweep (autoCells validation) ------------------
    // cold end-to-end per size (caches cleared each call): the honest
    // build+search comparison the auto-sizing default rests on
    val emb = table("embeddings")
    val eNorm = graft.ops.Similarity.withNorm(emb).filter(col("nrm") > 0)
    val auto = graft.ops.Similarity.autoCells(eNorm)
    println(s"[tune] autoCells(n=${eNorm.count()}) = $auto")
    for (k <- Seq(16, 32, auto, 128).distinct.sorted) {
      time(f"q23 pairs cold nCells=$k%-4d") {
        graft.ops.Similarity.clearIndexCaches()
        graft.ops.Similarity.cosinePairsBlocked(emb, 0.4, k).count()
      }
      time(f"q29 ivf cold nCells=$k%-4d") {
        graft.ops.Similarity.clearIndexCaches()
        graft.ops.Similarity.ivfTopK(emb, col("vec_id") % 10 === 0, 5, k, 2).count()
      }
    }

    spark.stop()
  }
}
