package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the points not dominated in
  * (minimize x, maximize y) — the price/quality trade-off query
  * (cheapest supplier per capability tier, best doc per cost bucket).
  *
  * The naive formulation is a quadratic NOT-EXISTS self-join (the
  * oracle replays it). The sort shape used here is the classic sweep:
  * reduce to one candidate per x (the max-y, since equal-x lower-y
  * points are dominated in y alone), sort by x ascending, keep a point
  * iff its y strictly exceeds the running max over all cheaper x.
  *
  * Scale shape — the sweep needs a total order, so a single global
  * window would serialize; this runs the standard TWO-PHASE skyline:
  * a salted local sweep first (every partition's frontier is a
  * SUPERSET of its contribution to the global frontier — domination by
  * an out-of-partition point is only missed, never invented), then the
  * global sweep over the survivors, whose size is bounded by the sum
  * of local frontier sizes (≪ distinct x in practice; worst case — a
  * perfectly anti-correlated staircase — nothing prunes, and the
  * global pass degrades to the exact single-sort cost the problem
  * inherently has). Both phases are window sweeps with O(1) state. */
object Pareto {

  /** Frontier of the point relation derived from `df`: one output row
    * per undominated (x, y) point, with `n` = number of source rows at
    * that exact point. `salts` sizes the phase-1 parallelism. */
  def skyline2D(df: DataFrame, xCol: Column, yCol: Column,
      salts: Int = 32): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val pts = df.select(xCol.as("x"), yCol.as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
    // one candidate per x: equal-x points are dominated by their max y
    val perX = pts.groupBy(col("x")).agg(max(col("y")).as("y"))
    def sweep(in: DataFrame, part: Seq[Column]): DataFrame = {
      val w0 = if (part.isEmpty) Window.orderBy(col("x"))
        else Window.partitionBy(part: _*).orderBy(col("x"))
      val w = w0.rowsBetween(Window.unboundedPreceding, -1)
      in.withColumn("ym", max(col("y")).over(w))
        .filter(col("ym").isNull || col("y") > col("ym"))
        .drop("ym")
    }
    val local = sweep(
      perX.withColumn("s", pmod(xxhash64(col("x")), lit(salts.toLong))),
      Seq(col("s"))).drop("s")
    sweep(local, Nil)
      .join(pts, Seq("x", "y"))
      .select(col("x"), col("y"), col("n"))
  }
}
