package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: A/B the materialization strategy for the frames that
  * several plan subtrees read (q23 cell assignment, q20/q22 shingle
  * sets): none (recompute per subtree), eager localCheckpoint (extra
  * job), lazy persist (first action fills the cache). Reports cold
  * (cache cleared per rep) and warm (cache retained — the repeated-search
  * production regime) medians. */
object MatAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def table(n: String) = graft.queries.Queries.table(spark, dir, n)

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val jobCount = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    })

    def ab(name: String)(run: String => Long): Unit =
      Seq("none", "checkpoint", "persist").foreach { mode =>
        spark.catalog.clearCache()
        run(mode) // warm JIT/codegen
        val cold = Seq.fill(5) {
          spark.catalog.clearCache()
          val t0 = System.nanoTime(); run(mode); (System.nanoTime() - t0) / 1e9
        }
        spark.catalog.clearCache()
        run(mode) // fill cache for warm reps
        jobCount.set(0)
        val warm = Seq.fill(5) {
          val t0 = System.nanoTime(); run(mode); (System.nanoTime() - t0) / 1e9
        }
        val jobsPerWarm = jobCount.get() / 5.0
        println(f"[matab] $name%-6s $mode%-10s cold ${median(cold)}%6.3f s   warm ${median(warm)}%6.3f s   jobs/warm $jobsPerWarm%.1f")
      }

    // do two reads of the same table produce sameResult plans? (the
    // plan-keyed index memos depend on it)
    val r1 = table("embeddings").queryExecution.analyzed
    val r2 = table("embeddings").queryExecution.analyzed
    println(s"[matab] table() sameResult across calls: ${r1.sameResult(r2)}")

    ab("q23")(mode => graft.ops.Similarity
      .cosinePairsBlockedMode(table("embeddings"), 0.4, 16, mode).count())
    ab("q20")(mode => graft.ops.Dedup
      .minhashNearDups(table("documents"), "doc_id", "text",
        shingleWidth = 3, k = 128, bands = 32, threshold = 0.8, mode = mode)
      .count())
    ab("q22")(mode => graft.ops.Dedup
      .ngramJaccardPairs(table("documents"), "doc_id", "text",
        blockCol = "lang",
        shingle = graft.functions.TextFunctions.wordShingles(_, 5),
        threshold = 0.5, mode = mode).count())

    // q23 nCells sweep (output is the exact pair set — blocking
    // granularity only changes pruning, never the answer)
    Seq(16, 32, 64, 128).foreach { nc =>
      spark.catalog.clearCache()
      def run(): Long = graft.ops.Similarity
        .cosinePairsBlockedMode(table("embeddings"), 0.4, nc, "persist").count()
      val n = run()
      val warm = Seq.fill(5) {
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[matab] q23 nCells=$nc%-4d warm ${median(warm)}%6.3f s   rows $n")
    }

    spark.stop()
  }
}
