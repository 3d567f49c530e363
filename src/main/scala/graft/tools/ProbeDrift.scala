package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: does the all-cores spin probe (Bench.probe) slow down as
  * a local[32] suite runs — i.e., is late-run probe "uncleanliness" JVM
  * state drift rather than host contention? Prints the probe min/median
  * before Spark, after session init, and after each heavy query batch. */
object ProbeDrift {
  @volatile var sink = 0L
  def probe(n: Int): Double = {
    val threads = (0 until n).map { _ =>
      val t = new Thread(() => {
        var x = 0L; var i = 0
        while (i < 10000000) { x += i; i += 1 }
        sink = x
      })
      t.start(); t
    }
    val t0 = System.nanoTime()
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e6
  }

  def stats(label: String): Unit = {
    val ps = (1 to 10).map(_ => probe(32)).sorted
    println(f"[drift] $label%-28s min ${ps.head}%6.2f ms  med ${ps(5)}%6.2f ms  max ${ps.last}%6.2f ms")
  }

  def main(args: Array[String]): Unit = {
    (1 to 20).foreach(_ => probe(32)) // JIT warm
    stats("pre-spark")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    stats("post-session")
    val dir = "/root/testdata/sf0.1"
    val qs = graft.SparkEntry.queries
    Seq("q08_join3_topk", "q20_dedup_minhash_lsh", "q23_dedup_embedding").foreach { n =>
      qs(n)(spark, dir).count()
    }
    stats("post-relational")
    Seq("q55_ann_recall_sample", "q68_srp_neardups", "q71_pq_topk",
      "q74_ivf_pq", "q75_ivf_pq_index_roundtrip").foreach { n =>
      qs(n)(spark, dir).count()
    }
    stats("post-similarity-pack")
    Thread.sleep(2000)
    stats("after 2s settle")
    spark.stop()
  }
}
