package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q105's steady-state serve floor — does the per-iteration
  * rank exchange + keyed agg chain cost jobs or stages, and what does
  * each checkpoint cadence / strategy variant buy? Run twice and trust
  * the later lines (warm JVM). */
object Q105Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        graft.queries.Queries.scratchRoot + "/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[q105probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%6.3f s ($n)")
    }
    val tbl = "pr_edges_probe_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    if (!spark.catalog.tableExists(tbl)) {
      val li = graft.queries.Queries.table(spark, dir, "lineitem")
      val fwd = li.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst"))
      val rev = li.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      t("index build (first touch)") {
        graft.ops.Graph.writeEdgeIndex(fwd.unionAll(rev), "src", "dst",
          tbl, buckets = 8); 0L
      }
    }
    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      t("serve ckpt=4 (current)") {
        graft.ops.Graph.pageRankFromIndex(spark, tbl, 5)
          .orderBy(col("rank_units").desc, col("node")).limit(100).count()
      }
      t("serve ckpt=99 (one chained job)") {
        graft.ops.Graph.pageRankFromIndex(spark, tbl, 5,
          checkpointInterval = 99)
          .orderBy(col("rank_units").desc, col("node")).limit(100).count()
      }
      t("serve ckpt=2") {
        graft.ops.Graph.pageRankFromIndex(spark, tbl, 5,
          checkpointInterval = 2)
          .orderBy(col("rank_units").desc, col("node")).limit(100).count()
      }
      t("table scan alone") {
        spark.table(tbl).count()
      }
      // the in-memory q90 path: does the r14 no-pin chaining insight
      // transfer to the shuffle-ranks variant (r13 measured 6.5 s with
      // the default pin at i=4), and what does broadcast cost there?
      val li = graft.queries.Queries.table(spark, dir, "lineitem")
      val fwd = li.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst"))
      val rev = li.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = fwd.unionAll(rev)
      t("q90 broadcast ckpt=4 (current)") {
        graft.ops.Graph.pageRank(edges, "src", "dst", 5,
          broadcastRanks = Some(true), checkpointInterval = 4)
          .orderBy(col("rank_units").desc, col("node")).limit(100).count()
      }
      t("q90 shuffle ckpt=99 (chained)") {
        graft.ops.Graph.pageRank(edges, "src", "dst", 5,
          broadcastRanks = Some(false), checkpointInterval = 99)
          .orderBy(col("rank_units").desc, col("node")).limit(100).count()
      }
      t("q90 shuffle ckpt=4") {
        graft.ops.Graph.pageRank(edges, "src", "dst", 5,
          broadcastRanks = Some(false), checkpointInterval = 4)
          .orderBy(col("rank_units").desc, col("node")).limit(100).count()
      }
    }
    spark.stop()
  }
}
