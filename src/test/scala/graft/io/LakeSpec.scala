package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class LakeSpec extends AnyFunSuite with SparkTest {

  test("sorted append produces within-file ordering (row-group skippable)") {
    val dir = s"/tmp/graft-test-lake/sorted-${System.nanoTime()}"
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_id"), col("ts"), col("user_id"))
    Lake.append(ev.repartition(4), dir, partitionCols = Nil,
      sortCols = Seq("ts"))

    // every individual file must be internally ts-ordered
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length > 1, "expect multiple task files")
    files.foreach { f =>
      val ts = spark.read.parquet(f).select("ts").collect().map(_.getLong(0))
      assert(ts.sameElements(ts.sorted), s"file $f not ts-ordered")
    }

    // predicate scan over the sorted lake reaches parquet as a pushed filter
    val probe = spark.read.parquet(dir).filter(col("ts") > lit(0L))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,0)]"), plan)
  }

  test("delta format switches on the classpath probe, parquet fallback otherwise") {
    // the switch itself, both probe outcomes
    assert(Lake.resolveFormat("delta", deltaAvailable = true) == "delta")
    assert(Lake.resolveFormat("delta", deltaAvailable = false) == "parquet")
    assert(Lake.resolveFormat("parquet", deltaAvailable = true) == "parquet")
    // a delta-format append must land readable data under whichever
    // format the real probe selects (parquet fallback in a Delta-less
    // environment, actual Delta if jars ever appear on the classpath)
    val landed = Lake.resolveFormat("delta", Lake.deltaOnClasspath)
    val dir = s"/tmp/graft-test-lake/delta-${System.nanoTime()}"
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_id"), col("event_type"))
    Lake.append(ev, dir, partitionCols = Seq("event_type"), format = "delta")
    assert(spark.read.format(landed).load(dir).count() == ev.count())
  }
}
