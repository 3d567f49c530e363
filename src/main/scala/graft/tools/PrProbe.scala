package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does q90's time go — edge prep, one iteration, five? */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s ($n rows)")
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val fwd = li.select((col("l_suppkey") * 2 + 1).as("src"), (col("l_partkey") * 2).as("dst"))
    val rev = li.select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    val edges = fwd.unionAll(rev)
    t("distinct+repartition+cache") {
      edges.select(col("src"), col("dst")).distinct()
        .repartition(col("src")).cache().count()
    }
    val e = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).cache()
    val degE = e.join(e.groupBy("src").agg(count(lit(1)).as("d")), "src")
      .sortWithinPartitions(col("src")).cache()
    t("degE cache")(degE.count())
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(col("node")).cache()
    t("nodes cache")(nodes.count())
    for (k <- Seq(1, 1, 2, 5)) {
      t(s"pageRank k=$k") {
        graft.ops.Graph.pageRank(edges, "src", "dst", iterations = k,
          broadcastRanks = Some(true), checkpointInterval = 1).count()
      }
    }
    t("pageRank k=5 nochk") {
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 5,
        broadcastRanks = Some(true), checkpointInterval = 99).count()
    }
    t("pageRank k=5 shuffle") {
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 5,
        broadcastRanks = Some(false), checkpointInterval = 1).count()
    }
    t("pageRank k=5 shuf-lazy") {
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 5,
        broadcastRanks = Some(false), checkpointInterval = 99).count()
    }
    t("pageRank k=5 bc-chk2") {
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 5,
        broadcastRanks = Some(true), checkpointInterval = 2).count()
    }
    val fn = graft.SparkEntry.queries("q90_pagerank")
    t("q90 via query (1st)")(fn(spark, dir).count())
    t("q90 via query (2nd)")(fn(spark, dir).count())
    val plan = fn(spark, dir).queryExecution.optimizedPlan.toString
    println("[prprobe] q90 optimized plan uses cache: " +
      plan.contains("InMemoryRelation") + "; scans: " +
      "Relation".r.findAllIn(plan).size)
    // isolate: same edges built the query's way (via Queries.table)
    val li2 = graft.queries.Queries.table(spark, dir, "lineitem")
    val fwd2 = li2.select((col("l_suppkey") * 2 + 1).as("src"), (col("l_partkey") * 2).as("dst"))
    val rev2 = li2.select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    val edges2 = fwd2.unionAll(rev2)
    t("pageRank on table() edges") {
      graft.ops.Graph.pageRank(edges2, "src", "dst", iterations = 5,
        broadcastRanks = Some(true)).count()
    }
    t("pageRank on table() edges 2nd") {
      graft.ops.Graph.pageRank(edges2, "src", "dst", iterations = 5,
        broadcastRanks = Some(true)).count()
    }
    t("query minus topk") {
      graft.ops.Graph.pageRank(edges2, "src", "dst", iterations = 5,
        broadcastRanks = Some(true))
        .orderBy(col("rank_units").desc, col("node")).limit(100).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("topk, AQE off") {
      graft.ops.Graph.pageRank(edges2, "src", "dst", iterations = 5,
        broadcastRanks = Some(true))
        .orderBy(col("rank_units").desc, col("node")).limit(100).count()
    }
    t("topk, AQE off, chk1") {
      graft.ops.Graph.pageRank(edges2, "src", "dst", iterations = 5,
        broadcastRanks = Some(true), checkpointInterval = 1)
        .orderBy(col("rank_units").desc, col("node")).limit(100).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t("topk, AQE on, chk1") {
      graft.ops.Graph.pageRank(edges2, "src", "dst", iterations = 5,
        broadcastRanks = Some(true), checkpointInterval = 1)
        .orderBy(col("rank_units").desc, col("node")).limit(100).count()
    }
    spark.stop()
  }
}
