package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B, round 18 (VERDICT r17 #3 — q90's in-session build, the
  * largest carried weak-list member at 2.77 s clean): pin strategy for
  * the fused placed edge relation. "cache" (the default) fills the
  * columnar InMemoryRelation lazily under iteration 1; "checkpoint"
  * materializes row-form partitions eagerly and preserves the captured
  * placement (the q214 read-side convention the verdict suggested
  * porting). Interleaved min-of-5 after warm-up so host drift cancels
  * across variants; q105's durable-index serve rides along as the
  * steady-state floor reference. */
object Pr18AB {
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
    def run(pin: String): Long =
      graft.ops.Graph.pageRank(edges, "src", "dst", 5, pin = pin)
        .orderBy(col("rank_units").desc, col("node")).limit(100).count()
    val q105 = graft.queries.Queries.all("q105_pagerank_index").fn
    val variants = Seq(
      ("cache", () => run("cache")),
      ("checkpoint (default)", () => run("checkpoint")),
      ("q105 serve ref", () => q105(spark, dir).count()))
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
      println(f"[pr18] $name%-20s min ${ts.head}%6.3f  med ${ts(2)}%6.3f  max ${ts.last}%6.3f")
    }
    spark.stop()
  }
}
