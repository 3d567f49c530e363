package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does q90's time go under the r11 fused setup —
  * one cached degE materialization (+free |V| off the sentinels),
  * per-iteration cost, checkpoint cadence, and the q105 index split
  * (build vs serve). Run twice and trust the later lines (warm JVM). */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", graft.queries.Queries.scratchRoot + "/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prprobe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.3f s ($n rows)")
    }
    val li = graft.queries.Queries.table(spark, dir, "lineitem")
    val fwd = li.select((col("l_suppkey") * 2 + 1).as("src"), (col("l_partkey") * 2).as("dst"))
    val rev = li.select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    val edges = fwd.unionAll(rev)

    // the fused setup alone: one cache fill + sentinel count
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).dropDuplicates("src", "dst")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val degERaw = e.join(e.groupBy("src").agg(count(lit(1)).as("d")), "src")
      .unionAll(nodes.select(col("node").as("src"), col("node").as("dst"),
        lit(Long.MaxValue).as("d")))
    val degE0 = degERaw.cache()
    t("fused degE cache + |V| count")(degE0.filter(col("d") === Long.MaxValue).count())
    degE0.unpersist(true)

    for (k <- Seq(1, 1, 2, 5)) {
      t(s"pageRank auto k=$k") {
        graft.ops.Graph.pageRank(edges, "src", "dst", iterations = k).count()
      }
    }
    for (chk <- Seq(1, 2, 4, 99)) {
      t(s"pageRank bc k=5 chk=$chk") {
        graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 5,
          broadcastRanks = Some(true), checkpointInterval = chk).count()
      }
    }
    t("pageRank shuffle k=5") {
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 5,
        broadcastRanks = Some(false)).count()
    }
    // q105 split: build vs serve
    t("writeEdgeIndex (build)") {
      graft.ops.Graph.writeEdgeIndex(edges, "src", "dst", "pr_probe_idx", 8); 0L
    }
    t("pageRankFromIndex k=5 (serve)") {
      graft.ops.Graph.pageRankFromIndex(spark, "pr_probe_idx", 5).count()
    }
    t("pageRankFromIndex k=5 (serve2)") {
      graft.ops.Graph.pageRankFromIndex(spark, "pr_probe_idx", 5).count()
    }
    val fn = graft.SparkEntry.queries("q90_pagerank")
    t("q90 via query (1st)")(fn(spark, dir).count())
    t("q90 via query (2nd)")(fn(spark, dir).count())
    val fn5 = graft.SparkEntry.queries("q105_pagerank_index")
    t("q105 via query (1st)")(fn5(spark, dir).count())
    t("q105 via query (2nd)")(fn5(spark, dir).count())
    spark.sql("DROP TABLE IF EXISTS pr_probe_idx")
    spark.stop()
  }
}
