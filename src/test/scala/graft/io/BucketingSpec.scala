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
}
