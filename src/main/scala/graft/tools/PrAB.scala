package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B: q90's rank-relation strategy, re-measured under bench-like
  * conditions (warm-up + min-of-5 per variant, variants interleaved so
  * host drift hits all sides equally). r13 adjudicated broadcast as the
  * right side at |V|=21k from a one-off probe; the r14 Q105Probe read
  * the opposite within its window — settle it properly. */
object PrAB {
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
    val li = graft.queries.Queries.table(spark, dir, "lineitem")
    val fwd = li.select((col("l_suppkey") * 2 + 1).as("src"),
      (col("l_partkey") * 2).as("dst"))
    val rev = li.select((col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    val edges = fwd.unionAll(rev)
    def run(bc: Option[Boolean], ck: Int): Long =
      graft.ops.Graph.pageRank(edges, "src", "dst", 5,
        broadcastRanks = bc, checkpointInterval = ck)
        .orderBy(col("rank_units").desc, col("node")).limit(100).count()
    val variants = Seq(
      ("broadcast ckpt4 (current)", () => run(Some(true), 4)),
      ("broadcast ckpt2", () => run(Some(true), 2)),
      ("shuffle ckpt4", () => run(Some(false), 4)),
      ("shuffle ckpt99 (chained)", () => run(Some(false), 99)))
    // warm every variant once, then 5 interleaved timed reps each
    variants.foreach(_._2())
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to 5).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f()
        times(name) = ((System.nanoTime() - t0) / 1e9) :: times(name)
      }
    }
    variants.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"[prab] $name%-28s min ${ts.head}%6.3f  med ${ts(2)}%6.3f  max ${ts.last}%6.3f")
    }
    spark.stop()
  }
}
