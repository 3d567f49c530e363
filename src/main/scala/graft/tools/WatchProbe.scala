package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: per-stage floor decompositions for the carried watch-list
  * queries (q113 triangles, q120 term lift, q190 rec eval) — VERDICT r14
  * item 6 asks each watch row to carry a measured stage split, the
  * q90/q184 convention. Each stage is timed as the cumulative pipeline
  * prefix (the deltas attribute cost to the stage added last); min of 3
  * rounds printed per stage. */
object WatchProbe {
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
    graft.functions.CatalystExpressions.register(spark)
    import graft.queries.Queries.table

    def best(name: String)(f: => Long): Unit = {
      var bt = Double.MaxValue; var n = 0L
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        n = f
        bt = math.min(bt, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[watch] $name%-34s $bt%7.3f s  ($n rows)")
    }

    // ---- q113 triangles ----
    {
      val o = table(spark, dir, "orders")
      def raw = o.select((col("o_custkey") % 256).as("x"),
        ((col("o_orderkey") * 31) % 256).as("y"))
      def e = raw.filter(col("x").isNotNull && col("y").isNotNull &&
          col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("u"),
          greatest(col("x"), col("y")).as("v")).distinct()
      best("q113.1 scan+canon+distinct")(e.count())
      best("q113.full triangles")(graft.ops.Graph.triangles(
        raw, "x", "y").count())
    }

    // ---- q120 term lift ----
    {
      val docs = table(spark, dir, "documents")
      def dt = docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          expr("transform(graft_word_counts(split(text, ' ')), " +
            "x -> x.term)").as("ts"))
      best("q120.1 distinct-token scan")(dt.count())
      best("q120.2 pair kernel+count")(dt
        .select(explode(call_function("graft_word_pairs", col("ts"))).as("p"))
        .select(col("p.ta").as("ta"), col("p.tb").as("tb"))
        .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_ab")).count())
      best("q120.full termLift")(graft.ops.TextAnalysis.termLift(
        docs, minDf = 5).count())
    }

    // ---- q190 rec eval ----
    {
      val li = table(spark, dir, "lineitem")
      def train = li.filter(col("l_shipdate") < lit("2000-07-01"))
      def test = li.filter(col("l_shipdate") >= lit("2000-07-01"))
      best("q190.1 train basket collect")(train
        .select(col("l_orderkey").as("bk"), col("l_partkey").cast("long").as("it"))
        .filter(col("it").isNotNull).groupBy(col("bk"))
        .agg(slice(sort_array(collect_set(col("it"))), 1, 10000).as("its"))
        .count())
      best("q190.2 train mine topk")(graft.ops.Recs.coVisitation(
        train, "l_orderkey", "l_partkey", k = 5).count())
      best("q190.3 + heldout pair set")(graft.ops.Recs.coOccurring(
        test, "l_orderkey", "l_partkey").count())
      best("q190.full recEval")(graft.ops.Eval.recEval(
        graft.ops.Recs.coVisitation(train, "l_orderkey", "l_partkey", k = 5),
        graft.ops.Recs.coOccurring(test, "l_orderkey", "l_partkey"),
        k = 5).count())
    }
    spark.stop()
  }
}
