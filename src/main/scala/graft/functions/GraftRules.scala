package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer extensions — the (c)-tier of the library's Spark
  * integration (compiled expressions being the (b)-tier): logical-plan
  * rewrites injected per session, applied by the optimizer to EVERY
  * query, so operators written with plain `functions._` pick them up
  * without opting in.
  */
object GraftRules {

  /** Strengthen `levenshtein(a, b) <= k` (and `<`) filters with the
    * free length prefilter `abs(length(a) - length(b)) <= k`: the
    * length difference lower-bounds edit distance, so the guard is
    * IMPLIED by the original predicate (never drops a row) while
    * short-circuiting the O(|a|·|b|) DP for the overwhelming majority
    * of non-matching candidate pairs in a fuzzy-linkage join (q97's
    * blocked candidates, and any ad-hoc user filter). The classic
    * predicate-strengthening rewrite every edit-distance engine
    * (Lucene fuzzy, DuckDB's own) performs internally — done here AT
    * THE PLAN LEVEL so it composes with pushdown: the cheap guard can
    * sink toward the scan independently of the expensive conjunct.
    *
    * Fixpoint-safe: a rewrite fires only if the SAME guard is not
    * already present in the enclosing filter condition
    * (semantic-equality check against the pre-rewrite condition), so
    * the optimizer's repeated passes leave the plan unchanged after
    * the first application. */
  object LevenshteinPrefilter extends Rule[LogicalPlan] {
    private def guardFor(lev: Levenshtein, k: Expression): Expression =
      LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, child) =>
        def alreadyGuarded(lev: Levenshtein, k: Expression): Boolean = {
          val g = guardFor(lev, k)
          cond.exists(_.semanticEquals(g))
        }
        val newCond = cond.transformUp {
          case le @ LessThanOrEqual(lev: Levenshtein, k @ Literal(_, IntegerType))
              if lev.threshold.isEmpty && !alreadyGuarded(lev, k) =>
            And(guardFor(lev, k), le)
          case lt @ LessThan(lev: Levenshtein, k @ Literal(_, IntegerType))
              if lev.threshold.isEmpty && !alreadyGuarded(lev, k) =>
            And(guardFor(lev, k), lt)
        }
        if (newCond fastEquals cond) f else Filter(newCond, child)
    }
  }

  /** Idempotently install the graft optimizer rules into a session via
    * `spark.experimental.extraOptimizations` (the runtime-injection
    * hook; [[GraftExtensions]] is the deploy-time equivalent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(LevenshteinPrefilter))
      exp.extraOptimizations = exp.extraOptimizations :+ LevenshteinPrefilter
  }
}
