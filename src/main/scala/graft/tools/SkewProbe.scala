package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: confirm the conditions under which AQE's
  * OptimizeSkewedJoin splits the hot-key posting join that
  * Dedup.ngramCandidates produces (the DedupSpec evidence test was pinned
  * with this). Findings at local scale: detection needs the skewed
  * partition over BOTH skewedPartitionThresholdInBytes and
  * skewedPartitionFactor × median — with a 25%-hot corpus the ratio sits
  * near 1.2-1.5, so the factor (default 5.0) is the binding knob in
  * test-scaled runs; production-scale hot keys clear the default easily. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        args.lift(1).getOrElse("1.2"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec

    def planStrings(p: SparkPlan): Seq[String] =
      p.toString +: p.collect { case s: QueryStageExec => s.plan }.flatMap(planStrings)

    def probe(name: String, df: DataFrame): Unit = {
      df.collect()
      val plan = planStrings(df.queryExecution.executedPlan).mkString("\n")
      println(s"[skewprobe] $name skew=${plan.contains("skew=true")} " +
        s"coalesced=${plan.contains("coalesced")}")
    }

    graft.functions.CatalystExpressions.register(spark)
    for (n <- Seq(500, 1000, 2000, 4000)) {
      val hot = (1 to n).map { i =>
        (i.toLong, s"aa aa aa aa aa u$i v$i w$i x$i y$i", "en")
      }.toDF("doc_id", "text", "lang")
      val sets = hot.select($"doc_id".as("id"), $"lang".as("blk"),
        graft.functions.TextFunctions.wordShingles($"text", 5).as("sh"))
      probe(s"ngramCandidates n=$n",
        graft.ops.Dedup.ngramCandidates(sets, 0.5).agg(count(lit(1)).as("n")))
    }
    spark.stop()
  }
}
