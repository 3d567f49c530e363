package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where q195's iterative-BPE time goes — the one corpus
  * pass (word-freq agg), the pure per-job scheduling floor (empty
  * collects on a cached 1-row frame), and the per-round cost of the
  * real loop (pair agg + TakeOrdered collect + occasional pin). Run
  * twice and trust the later lines (warm JVM). */
object BpeProbe {
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
      println(f"[bpeprobe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%6.3f s ($n)")
    }
    val docs = graft.queries.Queries.table(spark, dir, "documents")

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      // (a) the one corpus-sized stage: word-frequency agg
      t("wordfreq agg (corpus pass)") {
        docs.filter(col("text").isNotNull)
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("freq")).count()
      }
      // (b) pure job floor: 12 collects of a cached 1-row frame
      val one = spark.range(1).toDF("x").cache()
      one.count()
      t("12 empty collect jobs (floor)") {
        (1 to 12).foreach(_ => one.collect()); 12L
      }
      one.unpersist()
      // (c) the real loop, per-k scaling
      Seq(4, 8, 12).foreach { k =>
        t(s"bpeLearnMerges k=$k") {
          graft.ops.TextAnalysis.bpeLearnMerges(docs, k).count()
        }
      }
    }
    spark.stop()
  }
}
