package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class BucketingSpec extends AnyFunSuite with SparkTest {

  test("same-bucketed tables join with no shuffle exchange") {
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val o = spark.read.parquet(s"$sf0001/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
      Lake.writeBucketed(o, "bkt_orders", "o_orderkey", 4, Some("o_orderkey"))
      Lake.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bkt_lineitem", "o_orderkey", 4, Some("o_orderkey"))

      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$plan")

      // and the co-located join is still correct
      val expected = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }

  private def tableFiles(tbl: String): Map[String, Long] = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(loc).filter(_.isFile).map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .map(p => p.getName -> fs.getFileStatus(p).getLen).toMap
  }

  test("bucketIdColumn matches the bucket id Spark encodes in file names") {
    import spark.implicits._
    import org.apache.spark.sql.functions.input_file_name
    val df = (1L to 1000L).toDF("k")
    try {
      Lake.writeBucketed(df.repartition(8, col("k")), "bkt_idmatch", "k", 8)
      // every row's computed bucket id must equal the id parsed from the
      // file that holds it — the property rewriteBuckets stands on
      val mismatches = spark.table("bkt_idmatch")
        .select(col("k"), Lake.bucketIdColumn(col("k"), 8).as("b"),
          input_file_name().as("f"))
        .collect().count { r =>
          val name = r.getString(2).split('/').last
          !Lake.bucketIdOf(name).contains(r.getInt(1))
        }
      assert(mismatches == 0)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_idmatch")
  }

  test("rewriteBuckets: touched buckets replaced, untouched files reused " +
    "byte-for-byte, content equals a full rewrite (new target and in-place)") {
    import spark.implicits._
    val base = (1L to 400L).map(k => (k, k * 10)).toDF("k", "v")
    try {
      Lake.writeBucketed(base.repartition(8, col("k")), "bkt_rw_base", "k", 8,
        Some("k"))
      // delta touches the buckets of k ∈ {1, 2} only
      val deltaKeys = Seq(1L, 2L)
      val touched = deltaKeys.map(k =>
        spark.range(1).select(Lake.bucketIdColumn(lit(k), 8)).head().getInt(0))
        .distinct
      assert(touched.size < 8) // the test needs a strict subset
      // merged content of the touched buckets: base rows there, with the
      // delta keys' v bumped by 1
      val merged = Lake.readBuckets(spark, "bkt_rw_base", touched)
        .withColumn("v", when(col("k").isin(deltaKeys: _*), col("v") + 1)
          .otherwise(col("v")))
        .repartition(8, col("k"))
      val before = tableFiles("bkt_rw_base")
      // --- publish to a NEW table: base untouched, untouched bucket
      // files carried over with identical names/sizes
      Lake.rewriteBuckets(spark, "bkt_rw_base", "bkt_rw_out", merged,
        touched, "k", 8, Some("k"))
      assert(tableFiles("bkt_rw_base") == before) // base never mutated
      val expected = base
        .withColumn("v", when(col("k").isin(deltaKeys: _*), col("v") + 1)
          .otherwise(col("v")))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(spark.table("bkt_rw_out").as[(Long, Long)].collect().sorted.toSeq
        == expected)
      val outFiles = tableFiles("bkt_rw_out")
      val untouchedBefore = before.filter { case (n, _) =>
        !Lake.bucketIdOf(n).exists(touched.contains) }
      assert(untouchedBefore.forall { case (n, len) =>
        outFiles.get(n).contains(len) }) // reused as-is
      assert(before.keySet.intersect(outFiles.keySet) == untouchedBefore.keySet)
      // --- in-place: touched files swap, untouched stay the same files
      Lake.rewriteBuckets(spark, "bkt_rw_base", "bkt_rw_base", merged,
        touched, "k", 8, Some("k"))
      val after = tableFiles("bkt_rw_base")
      assert(spark.table("bkt_rw_base").as[(Long, Long)].collect().sorted.toSeq
        == expected)
      assert(untouchedBefore.forall { case (n, len) =>
        after.get(n).contains(len) })
      assert(after.keySet.intersect(before.keySet) == untouchedBefore.keySet)
      // one file per touched bucket (the merged frame arrived placed)
      touched.foreach { b =>
        assert(after.keys.count(n => Lake.bucketIdOf(n).contains(b)) == 1)
      }
    } finally Seq("bkt_rw_base", "bkt_rw_out").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("appendToWeightedEdgeIndex publishes O(touched buckets): a delta " +
    "confined to few buckets leaves the other buckets' files untouched") {
    import spark.implicits._
    try {
      // base graph over many srcs spread across all 8 buckets
      val baseE = (1L to 200L).map(s => (s, s + 1000L, 1L)).toDF("src", "dst", "w")
      graft.ops.Graph.writeWeightedEdgeIndex(baseE, "src", "dst", "w",
        "bkt_wapp", buckets = 8)
      val before = tableFiles("bkt_wapp")
      // a one-edge delta touches at most two buckets (src's and dst's)
      val delta = Seq((7L, 1007L, 5L)).toDF("src", "dst", "w")
      graft.ops.Graph.appendToWeightedEdgeIndex(delta, "src", "dst", "w",
        "bkt_wapp", buckets = 8)
      val after = tableFiles("bkt_wapp")
      val touched = Seq(7L, 1007L).map(k =>
        spark.range(1).select(Lake.bucketIdColumn(lit(k), 8)).head().getInt(0))
        .distinct
      val untouchedBefore = before.filter { case (n, _) =>
        !Lake.bucketIdOf(n).exists(touched.contains) }
      assert(untouchedBefore.nonEmpty)
      assert(untouchedBefore.forall { case (n, len) =>
        after.get(n).contains(len) }) // publish never rewrote them
      // and the merged index still equals the full rebuild
      graft.ops.Graph.writeWeightedEdgeIndex(baseE.unionByName(delta),
        "src", "dst", "w", "bkt_wapp_whole", buckets = 8)
      def rows(t: String) = spark.table(t)
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      assert(rows("bkt_wapp") == rows("bkt_wapp_whole"))
    } finally Seq("bkt_wapp", "bkt_wapp_whole").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
