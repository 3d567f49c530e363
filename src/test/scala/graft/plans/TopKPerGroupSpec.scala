package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** The custom top-k-per-group physical operator: result equivalence
  * with the window formulation, the partial/final plan shape with the
  * exchange BETWEEN the phases, and the shuffle-volume bound that is
  * the operator's reason to exist. */
class TopKPerGroupSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("equals the window formulation on seeded data (ties broken by id)") {
    val rnd = new scala.util.Random(0x70BBL)
    val rows = (1 to 5000).map(i =>
      ("g" + rnd.nextInt(7), rnd.nextInt(50).toLong, i.toLong))
    val df = rows.toDF("g", "v", "id").repartition(8)
    for (k <- Seq(1, 3, 10)) {
      val got = TopKPerGroup.topKPerGroup(df, Seq("g"),
          Seq(col("v").desc, col("id").asc), k)
        .select("g", "v", "id").as[(String, Long, Long)]
        .collect().sortBy(r => (r._1, -r._2, r._3)).toSeq
      val want = windowTopK(df, k)
        .select("g", "v", "id").as[(String, Long, Long)]
        .collect().sortBy(r => (r._1, -r._2, r._3)).toSeq
      assert(got == want, s"k=$k")
    }
  }

  test("plan: partial below the exchange, final above it") {
    val df = (1 to 100).map(i => ("g" + (i % 3), i.toLong, i.toLong))
      .toDF("g", "v", "id").repartition(4)
    val plan = TopKPerGroup.topKPerGroup(df, Seq("g"),
      Seq(col("v").desc, col("id")), 2).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial"), plan)
    assert(plan.contains("TopKPerGroupFinal"), plan)
    val lines = plan.linesIterator.toSeq
    val fi = lines.indexWhere(_.contains("TopKPerGroupFinal"))
    val ei = lines.indexWhere(_.contains("Exchange"))
    val pi = lines.indexWhere(_.contains("TopKPerGroupPartial"))
    assert(fi < ei && ei < pi, s"phase order wrong:\n$plan")
  }

  test("shuffle volume is bounded by groups x partitions x k") {
    // 40000 rows, 4 groups, 8 partitions, k=2: the exchange must carry
    // at most 4*8*2 = 64 rows — the operator's entire point
    val rows = (1 to 40000).map(i => ("g" + (i % 4), i.toLong, i.toLong))
    val df = rows.toDF("g", "v", "id").repartition(8)
    val out = TopKPerGroup.topKPerGroup(df, Seq("g"),
      Seq(col("v").desc, col("id")), 2)
    out.collect()
    // unwrap AQE to reach the executed exchange, then read its shuffle
    // write metrics (records written = rows that crossed the wire)
    val finalPlan = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // QueryStageExec nodes hide their subtree behind `plan`, so a plain
    // collect stops at stage boundaries — recurse through them
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    // only the exchange whose subtree holds the PARTIAL node is the
    // operator's shuffle (the test's own repartition is the other one)
    val metrics = allNodes(finalPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if allNodes(e).exists(_.nodeName.contains("TopKPerGroupPartial")) =>
        e.metrics.collect {
          case (k, m) if k.toLowerCase.contains("records") => m.value
        }
    }.flatten
    assert(metrics.nonEmpty && metrics.forall(_ <= 64L),
      s"operator shuffle carried ${metrics.mkString(",")} rows")
    // and the answer is still the global top-2 per group
    assert(out.count() == 8)
    val top = out.as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(top("g3") == Set(39999L, 39995L))
  }

  test("single partition, k larger than group size, empty input") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L)).toDF("g", "v", "id")
    val all = TopKPerGroup.topKPerGroup(df, Seq("g"),
      Seq(col("v").desc, col("id")), 10)
    assert(all.count() == 2)
    val none = TopKPerGroup.topKPerGroup(df.filter(lit(false)), Seq("g"),
      Seq(col("v").desc, col("id")), 3)
    assert(none.count() == 0)
  }
}
