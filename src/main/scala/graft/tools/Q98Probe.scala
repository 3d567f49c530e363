package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r10 item 2): decompose q98's audit time per
  * branch and A/B the fused candidate — row checks + uniqueness in ONE
  * keyed pass over orders (the keyed frame doubling as the FK reference)
  * and row checks + FK orphan count in ONE pass over lineitem (left
  * join + conditional agg instead of an anti join plus a second scan). */
object Q98Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Quality
    import graft.queries.Queries
    val o = Queries.table(spark, dir, "orders")
    val li = Queries.table(spark, dir, "lineitem")

    def time(name: String)(f: => Long): Unit = {
      val reps = Seq.fill(5) {
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val ts = reps.map(_._1).sorted
      println(f"[q98] $name%-34s min ${ts.head}%6.3f s  med ${ts(2)}%6.3f s (${reps.head._2} rows)")
    }

    val oChecks = Seq(
      Quality.notNull("orders.o_orderkey.not_null", col("o_orderkey")),
      Quality.inRange("orders.o_totalprice.range", col("o_totalprice"),
        lit(0.0), lit(1.0e9)),
      Quality.inSet("orders.o_orderstatus.domain", col("o_orderstatus"),
        Seq("F", "O", "P")))
    val liChecks = Seq(
      Quality.inRange("lineitem.l_quantity.range", col("l_quantity"),
        lit(1.0), lit(50.0)))

    time("branch: rowAudit(orders)")(Quality.rowAudit(o, oChecks).count())
    time("branch: uniqueAudit(orders)") {
      Quality.uniqueAudit(o, "orders.o_orderkey.unique", Seq("o_orderkey")).count()
    }
    time("branch: fkAudit(li->o)") {
      Quality.fkAudit(li, "lineitem.l_orderkey.fk_orders", "l_orderkey",
        o, "o_orderkey").count()
    }
    time("branch: rowAudit(lineitem)")(Quality.rowAudit(li, liChecks).count())
    time("current q98 (union of 4)") {
      graft.SparkEntry.queries("q98_quality_audit")(spark, dir).count()
    }

    // fused candidate
    def fused: DataFrame = {
      // orders: ONE keyed pass — per-key row-check partials + multiplicity,
      // then a tiny final agg; the keyed frame is also the FK reference
      val keyed = o.groupBy(col("o_orderkey")).agg(
        count(lit(1)).as("__m"),
        oChecks.map(ch => sum(when(coalesce(ch.ok, lit(false)), 0L)
          .otherwise(1L)).as(ch.name)): _*)
      val oAgg = keyed.agg(
        coalesce(sum(col("__m")), lit(0L)).as("__n"),
        (coalesce(sum(when(col("__m") > 1, col("__m")).otherwise(0L)), lit(0L))
          .as("orders.o_orderkey.unique") +:
          oChecks.map(ch => sum(col("`" + ch.name + "`")).as(ch.name))): _*)
      val oRows = (Quality.RowCheck("orders.o_orderkey.unique", lit(true)) +: oChecks).map(ch =>
        struct(lit(ch.name).as("check_name"),
          col("`" + ch.name + "`").as("n_violations"),
          col("__n").as("n_checked")))
      val ordersReport = oAgg.select(explode(array(oRows: _*)).as("r"))
        .select(col("r.check_name"), col("r.n_violations"), col("r.n_checked"))
      // lineitem: ONE pass — left join against the distinct keys, FK orphan
      // + row checks in the same conditional agg
      val refKeys = keyed.select(col("o_orderkey").as("l_orderkey"),
        lit(true).as("__hit"))
      val liAgg = li.join(refKeys, Seq("l_orderkey"), "left")
        .agg(count(lit(1)).as("__n"),
          (sum(when(col("__hit").isNull, 1L).otherwise(0L))
            .as("lineitem.l_orderkey.fk_orders") +:
            liChecks.map(ch => sum(when(coalesce(ch.ok, lit(false)), 0L)
              .otherwise(1L)).as(ch.name))): _*)
      val liRows = (Quality.RowCheck("lineitem.l_orderkey.fk_orders", lit(true)) +: liChecks).map(ch =>
        struct(lit(ch.name).as("check_name"),
          col("`" + ch.name + "`").as("n_violations"),
          col("__n").as("n_checked")))
      val liReport = liAgg.select(explode(array(liRows: _*)).as("r"))
        .select(col("r.check_name"), col("r.n_violations"), col("r.n_checked"))
      ordersReport.unionAll(liReport).orderBy("check_name")
    }
    time("fused candidate")(fused.count())
    val cur = graft.SparkEntry.queries("q98_quality_audit")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val fus = fused.collect().map(_.toSeq).toSeq
    println(s"[q98] fused == current: ${cur == fus}")
    if (cur != fus) {
      println(s"[q98] current: $cur")
      println(s"[q98] fused:   $fus")
    }
    spark.stop()
  }
}
