package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class GraphSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("pageRank on a 2-node cycle converges to equal ranks, mass conserved") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iterations = 10)
      .as[(Long, Long)].collect().toMap
    // symmetric graph: both nodes identical by symmetry at every iteration
    assert(r(1L) == r(2L))
    // each node's rank stays ~1.0 (teleport + damped full inheritance);
    // integer truncation loses at most a few units per iteration
    assert(math.abs(r(1L) - Graph.SCALE) < 100L, r.toString)
  }

  test("star + chain: rank flows along edges, teleport-only spokes tie") {
    // spokes 3..5 point at hub 1; hub forwards everything to 2. The
    // spokes get teleport only (no in-edges); the hub aggregates their
    // mass; 2 inherits the hub's ENTIRE damped rank and ends highest.
    val edges = (3L to 5L).map(s => (s, 1L)).toDF("src", "dst")
      .unionAll(Seq((1L, 2L)).toDF("src", "dst"))
    val r = Graph.pageRank(edges, "src", "dst", iterations = 10)
      .as[(Long, Long)].collect().toMap
    assert(r(2L) > r(1L) && r(1L) > r(3L), r.toString)
    assert(r(3L) == r(4L) && r(4L) == r(5L), "symmetric spokes must tie")
    assert(r(3L) == (100L - 85L) * Graph.SCALE / 100L, "teleport-only spoke")
  }

  test("rank-strategy selection: broadcast iff |V| <= broadcastMaxNodes, " +
    "forced override wins") {
    assert(Graph.chooseRankStrategy(1000000L, 1000000L, None))
    assert(!Graph.chooseRankStrategy(1000001L, 1000000L, None))
    assert(!Graph.chooseRankStrategy(10L, 1000000L, Some(false)))
    assert(Graph.chooseRankStrategy(10000000000L, 1000000L, Some(true)))
  }

  test("broadcast and shuffle rank paths are bit-identical") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val edges = li.select(($"l_suppkey" * 2 + 1).as("src"), ($"l_partkey" * 2).as("dst"))
    val b = Graph.pageRank(edges, "src", "dst", iterations = 3,
      broadcastRanks = Some(true)).as[(Long, Long)].collect().sorted.toSeq
    val s = Graph.pageRank(edges, "src", "dst", iterations = 3,
      broadcastRanks = Some(false)).as[(Long, Long)].collect().sorted.toSeq
    assert(b == s && b.nonEmpty)
  }

  test("pageRankFromIndex equals in-memory pageRank bit-for-bit") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val fwd = li.select(($"l_suppkey" * 2 + 1).as("src"), ($"l_partkey" * 2).as("dst"))
    val rev = li.select(($"l_partkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
    val edges = fwd.unionAll(rev)
    try {
      Graph.writeEdgeIndex(edges, "src", "dst", "pr_edges_spec", buckets = 4)
      val served = Graph.pageRankFromIndex(spark, "pr_edges_spec", iterations = 3)
        .as[(Long, Long)].collect().sorted.toSeq
      val direct = Graph.pageRank(edges, "src", "dst", iterations = 3)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(served == direct && served.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS pr_edges_spec")
  }

  test("personalizedPageRankFromIndex: hand-computed restart, uniform seed degenerates to pageRank") {
    // chain 1 -> 2 -> 3, seed = {1}. teleport t = 0.15*SCALE lands only
    // on 1; after enough iterations: u1 = t, u2 = t + 85*u1 div 100,
    // u3 = t3 = 0 + 85*(u2 div 1) div 100 ... hand-walk 3 iterations.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    try {
      Graph.writeEdgeIndex(edges, "src", "dst", "ppr_spec", buckets = 2)
      val got = Graph.personalizedPageRankFromIndex(spark, "ppr_spec",
        iterations = 3, seed = n => n === 1L)
        .as[(Long, Long)].collect().toMap
      val S = Graph.SCALE; val t = 15L * S / 100L
      // r0 = (S, 0, 0)
      // i1: u1 = t; u2 = 0 + 85*S div 100; u3 = 0
      // i2: u1 = t; u2 = 85*t div 100;     u3 = 85*(85*S div 100) div 100
      // i3: u1 = t; u2 = 85*t div 100;     u3 = 85*(85*t div 100) div 100
      val u2 = 85L * t / 100L
      assert(got(1L) == t, got.toString)
      assert(got(2L) == u2, got.toString)
      assert(got(3L) == 85L * u2 / 100L, got.toString)
      // an always-true seed is exactly the classic walk
      val uni = Graph.personalizedPageRankFromIndex(spark, "ppr_spec",
        iterations = 3, seed = _ => lit(true))
        .as[(Long, Long)].collect().sorted.toSeq
      val classic = Graph.pageRankFromIndex(spark, "ppr_spec", iterations = 3)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(uni == classic)
    } finally spark.sql("DROP TABLE IF EXISTS ppr_spec")
  }

  test("weightedPageRankFromIndex: hand-computed asymmetric split; equal weights degenerate to the unweighted walk bit-for-bit") {
    // 1 splits 3:1 between 2 and 3 — contribution floor(u·w/Σw)
    val wedges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    try {
      Graph.writeWeightedEdgeIndex(wedges, "src", "dst", "w", "wpr_spec",
        buckets = 2)
      val got = Graph.weightedPageRankFromIndex(spark, "wpr_spec",
        iterations = 1).as[(Long, Long)].collect().toMap
      val S = Graph.SCALE; val t = 15L * S / 100L
      assert(got(1L) == t, got.toString) // no in-edges: teleport only
      assert(got(2L) == t + 85L * (S * 3L / 4L) / 100L, got.toString)
      assert(got(3L) == t + 85L * (S * 1L / 4L) / 100L, got.toString)
      // duplicate edges pre-sum at build: (1,2,1)+(1,2,2) == (1,2,3)
      Graph.writeWeightedEdgeIndex(
        Seq((1L, 2L, 1L), (1L, 2L, 2L), (1L, 3L, 1L)).toDF("src", "dst", "w"),
        "src", "dst", "w", "wpr_spec_dup", buckets = 2)
      val dup = Graph.weightedPageRankFromIndex(spark, "wpr_spec_dup",
        iterations = 1).as[(Long, Long)].collect().toMap
      assert(dup == got)
    } finally {
      spark.sql("DROP TABLE IF EXISTS wpr_spec")
      spark.sql("DROP TABLE IF EXISTS wpr_spec_dup")
    }
    // floor(u·c/(c·d)) = floor(u/d): constant weights == unweighted walk
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val fwd = li.select(($"l_suppkey" * 2 + 1).as("src"), ($"l_partkey" * 2).as("dst"))
    val rev = li.select(($"l_partkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
    val edges = fwd.unionAll(rev)
    try {
      // w = 7 per DISTINCT edge (the unweighted index dedups, so the
      // degenerate comparison must too)
      Graph.writeWeightedEdgeIndex(
        edges.distinct().withColumn("w", lit(7L)), "src", "dst", "w",
        "wpr_eq", buckets = 4)
      Graph.writeEdgeIndex(edges, "src", "dst", "pr_eq", buckets = 4)
      val w = Graph.weightedPageRankFromIndex(spark, "wpr_eq", iterations = 3)
        .as[(Long, Long)].collect().sorted.toSeq
      val u = Graph.pageRankFromIndex(spark, "pr_eq", iterations = 3)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(w == u && w.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS wpr_eq")
      spark.sql("DROP TABLE IF EXISTS pr_eq")
    }
  }

  test("writeWeightedEdgeIndex refuses weights that can wrap the 64-bit fixed-point update") {
    // bound = max(w,100) · |V| · SCALE ≥ 2^63 must trip at build time:
    // two nodes, one edge with w ≈ 2^33 → 2^33 · 2 · 10^9 > 2^63
    val huge = Seq((1L, 2L, 1L << 33)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException] {
      Graph.writeWeightedEdgeIndex(huge, "src", "dst", "w", "wpr_overflow",
        buckets = 2)
    }
    assert(e.getMessage.contains("overflow"), e.getMessage)
    assert(!spark.catalog.tableExists("wpr_overflow")) // nothing written
    // negative weights rejected outright
    val neg = Seq((1L, 2L, -3L)).toDF("src", "dst", "w")
    val e2 = intercept[IllegalArgumentException] {
      Graph.writeWeightedEdgeIndex(neg, "src", "dst", "w", "wpr_neg",
        buckets = 2)
    }
    assert(e2.getMessage.contains("negative"), e2.getMessage)
  }

  test("appendToWeightedEdgeIndex ≡ rebuild over the union, row-for-row " +
    "(weights, totals, sentinels); overflow bound re-checks on append") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    def edges(f: org.apache.spark.sql.DataFrame) = f
      .select(($"l_suppkey" * 2 + 1).as("src"), ($"l_partkey" * 2).as("dst"))
      .unionAll(f.select(($"l_partkey" * 2).as("src"),
        ($"l_suppkey" * 2 + 1).as("dst")))
      .withColumn("w", lit(1L))
    def rows(t: String) = spark.table(t)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    try {
      Graph.writeWeightedEdgeIndex(edges(li.filter($"l_orderkey" % 7 =!= 0)),
        "src", "dst", "w", "wpr_app", buckets = 4)
      Graph.appendToWeightedEdgeIndex(edges(li.filter($"l_orderkey" % 7 === 0)),
        "src", "dst", "w", "wpr_app", buckets = 4)
      Graph.writeWeightedEdgeIndex(edges(li), "src", "dst", "w",
        "wpr_whole", buckets = 4)
      val (app, whole) = (rows("wpr_app"), rows("wpr_whole"))
      assert(app == whole && app.nonEmpty)
      // batch weights ADD to stored weights (multigraph semantics):
      // re-appending the same batch doubles exactly its edges' w
      val batch = edges(li.filter($"l_orderkey" % 7 === 0))
      Graph.appendToWeightedEdgeIndex(batch, "src", "dst", "w",
        "wpr_app", buckets = 4)
      Graph.writeWeightedEdgeIndex(edges(li).unionByName(batch),
        "src", "dst", "w", "wpr_twice", buckets = 4)
      assert(rows("wpr_app") == rows("wpr_twice"))
      // a batch that pushes max(w) past the 2^63 envelope REFUSES
      val huge = Seq((1L, 2L, 1L << 33)).toDF("src", "dst", "w")
      val e = intercept[IllegalArgumentException] {
        Graph.appendToWeightedEdgeIndex(huge, "src", "dst", "w",
          "wpr_app", buckets = 4)
      }
      assert(e.getMessage.contains("overflow"), e.getMessage)
    } finally Seq("wpr_app", "wpr_whole", "wpr_twice").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("pageRankFromIndex iteration joins shuffle ONLY the rank side") {
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
      Graph.writeEdgeIndex(edges, "src", "dst", "pr_edges_plan", buckets = 4)
      val degE = spark.table("pr_edges_plan")
      val ranks = degE.filter($"d" === Long.MaxValue)
        .select($"src".as("node")).withColumn("u", lit(Graph.SCALE))
      // iteration-1 join: BOTH sides come off the placed table (ranks
      // init is the sentinel filter), so the SMJ is fully co-located —
      // zero shuffles; later iterations exchange only the |V|-row
      // aggregated rank relation, never the edge scan
      val joined = degE.join(ranks.withColumnRenamed("node", "src"), "src")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"iteration-1 join must be exchange-free; plan was:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"edge side must be the bucketed scan; plan was:\n$plan")
      // full-iteration shape: the contribution aggregation re-keys by
      // dst, so exactly ONE shuffle (of |V|-scale aggregated rows) per
      // iteration — the edge table never moves
      val iter = joined
        .select($"dst".as("node"), expr("u div d").as("c"))
        .groupBy("node").agg(sum($"c").as("c"))
      val iterPlan = iter.queryExecution.executedPlan.toString
      assert(iterPlan.split("Exchange hashpartitioning").length - 1 == 1,
        s"one iteration must shuffle exactly once (the agg); plan was:\n$iterPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.sql("DROP TABLE IF EXISTS pr_edges_plan")
    }
  }

  test("deterministic under repartitioning (integer arithmetic, no FP order)") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    def edges(parts: Int) = {
      val fwd = li.select(($"l_suppkey" * 2 + 1).as("src"), ($"l_partkey" * 2).as("dst"))
      val rev = li.select(($"l_partkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      fwd.unionAll(rev).repartition(parts)
    }
    val a = Graph.pageRank(edges(3), "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val b = Graph.pageRank(edges(11), "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("triangles: hand-computed graphs (K4, path, shared-edge pair)") {
    import spark.implicits._
    def tri(es: Seq[(Long, Long)]): Map[Long, Long] =
      Graph.triangles(es.toDF("x", "y"), "x", "y")
        .as[(Long, Long)].collect().toMap
    // K4: each node is in C(3,2) = 3 triangles
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    assert(tri(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // a path has no triangles
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == Map.empty)
    // two triangles sharing edge (1,2)
    val shared = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    assert(tri(shared) == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("triangles: canonicalizes direction, duplicates, and self-loops") {
    import spark.implicits._
    // same triangle stated with reversed/duplicated edges + a self-loop
    val messy = Seq((1L, 2L), (2L, 1L), (3L, 2L), (1L, 3L), (1L, 3L), (2L, 2L))
    val got = Graph.triangles(messy.toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles equals the brute-force 3-join on a pseudo-random graph") {
    import spark.implicits._
    // deterministic pseudo-random simple graph on 40 nodes
    val rnd = new scala.util.Random(42)
    val es = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val df = es.toDF("x", "y")
    val got = Graph.triangles(df, "x", "y").as[(Long, Long)].collect().toMap
    df.select(least($"x", $"y").as("u"), greatest($"x", $"y").as("v"))
      .distinct().createOrReplaceTempView("tri_e")
    val brute = spark.sql(
      """SELECT node, count(*) AS c FROM (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM tri_e e1
        |  JOIN tri_e e2 ON e2.u = e1.v
        |  JOIN tri_e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |LATERAL VIEW explode(array(a, b, c)) AS node GROUP BY node
        |""".stripMargin).as[(Long, Long)].collect().toMap
    assert(got == brute && got.nonEmpty)
  }
}
