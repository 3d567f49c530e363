package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** TOP-K-PER-GROUP as a first-class physical operator — the (c)-tier
  * Catalyst integration (custom `LogicalPlan` + `Strategy` +
  * `SparkPlan`): the window formulation
  * (`row_number().over(partitionBy(g).orderBy(o)) <= k`) Spark plans as
  * Exchange → full per-group SORT → filter — every row shuffles and
  * sorts, k or not. This operator runs the bounded-heap algorithm the
  * problem actually wants, in TWO phases like an aggregate:
  *
  *  - PARTIAL (map-side): per partition, one k-bounded heap per group —
  *    at most k rows per (partition, group) survive to the shuffle.
  *    With G groups and P partitions the exchange carries ≤ G·P·k rows
  *    instead of ALL rows — at 100 TB this is the difference between
  *    shuffling kilobytes and shuffling the table;
  *  - FINAL: the same heap over the clustered partials (top-k of a
  *    union of per-partition top-k's is the global top-k — the
  *    standard merge argument). `EnsureRequirements` inserts the
  *    exchange between the phases from the declared distributions,
  *    exactly as it does for partial/final aggregates.
  *
  * Output rows are emitted in heap (arbitrary) order — compose with
  * `orderBy` like any aggregate. Ties beyond position k are CUT by
  * row order (make the ordering total — id tie-break — for
  * deterministic results, as the q67 window would need anyway). */
object TopKPerGroup {

  final case class TopKPerGroupNode(group: Seq[Expression],
      order: Seq[SortOrder], k: Int, child: LogicalPlan) extends UnaryNode {
    require(k >= 1, "k must be >= 1")
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
      copy(child = c)
  }

  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroupNode(g, o, k, child) =>
        TopKPerGroupExec(g, o, k, partial = false,
          TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  final case class TopKPerGroupExec(group: Seq[Expression],
      order: Seq[SortOrder], k: Int, partial: Boolean, child: SparkPlan)
      extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def nodeName: String =
      if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"
    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(group) :: Nil
    // the operator filters rows within partitions, never moves them —
    // propagating the child's partitioning lets EnsureRequirements see
    // a bucketed scan THROUGH the partial phase, so serving top-k off a
    // group-bucketed table is exchange-free (the q207 serve path)
    override def outputPartitioning:
        org.apache.spark.sql.catalyst.plans.physical.Partitioning =
      child.outputPartitioning

    override protected def doExecute(): RDD[InternalRow] = {
      val groupExprs = group
      val sortOrder = order
      val limit = k
      val childOutput = child.output
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(groupExprs, childOutput)
        val rowProj = UnsafeProjection.create(
          childOutput.map(_.asInstanceOf[Expression]), childOutput)
        val ordering = RowOrdering.create(sortOrder, childOutput)
        // per group: a max-heap under `ordering` capped at k — peek is
        // the WORST kept row, replaced when a better one arrives
        val heaps = new java.util.HashMap[UnsafeRow,
          java.util.PriorityQueue[UnsafeRow]]()
        while (iter.hasNext) {
          val row = rowProj(iter.next()).copy()
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[UnsafeRow](limit + 1,
              ordering.reversed().asInstanceOf[java.util.Comparator[UnsafeRow]])
            heaps.put(key.copy(), heap)
          }
          if (heap.size() < limit) heap.add(row)
          else if (ordering.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.add(row)
          }
        }
        val it = heaps.values().iterator()
        new Iterator[InternalRow] {
          private var cur: java.util.Iterator[UnsafeRow] =
            java.util.Collections.emptyIterator()
          override def hasNext: Boolean = {
            while (!cur.hasNext && it.hasNext) cur = it.next().iterator()
            cur.hasNext
          }
          override def next(): InternalRow = cur.next()
        }
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
      copy(child = c)
  }

  /** Install the strategy into a session (idempotent — the
    * `extraStrategies` twin of `GraftRules.install`; GraftExtensions
    * injects it at deploy time via `injectPlannerStrategy`). */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
  }

  /** User API: top `k` rows per `groupCols` under `orderCols` (pass
    * `col(...).asc / .desc` columns; a non-sort column defaults to
    * ascending). Group columns must be plain columns of `df`. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    val byName = analyzed.output.map(a => a.name -> a).toMap
    val g = groupCols.map(c => byName.getOrElse(c,
      throw new IllegalArgumentException(s"no column $c")): Expression)
    val o = orderCols
      .map(org.apache.spark.sql.classic.GraftSqlBridge.expressionOf).map {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    }.map { s =>
      // resolve bare UnresolvedAttribute children against the analyzed output
      s.copy(child = s.child.transform {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          byName.getOrElse(u.name,
            throw new IllegalArgumentException(s"no column ${u.name}"))
      })
    }
    org.apache.spark.sql.classic.GraftSqlBridge.ofRows(spark,
      TopKPerGroupNode(g, o, k, analyzed))
  }
}
