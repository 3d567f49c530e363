package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** The Levenshtein length-prefilter optimizer rule: soundness (same
  * rows), plan effect (the guard appears), and fixpoint stability (the
  * optimizer's repeated passes don't stack guards). */
class GraftRulesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    GraftRules.install(spark)
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == GraftRules.LevenshteinPrefilter)
  }

  test("guard appears once in the optimized plan and never stacks") {
    withRule {
      // a file-backed scan: a LocalRelation input would let the
      // optimizer evaluate the whole filter at plan time
      val df = spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("lang").as("x"), col("source").as("y"))
        .filter(expr("levenshtein(x, y) <= 2"))
      val opt = df.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt.contains("levenshtein"), opt)
      // the guard sank to the scan-side filter along with the predicate
      assert(opt.contains("abs((length("), opt)
      // fixpoint: exactly one guard despite the optimizer's multiple passes
      val guards = "abs\\(\\(length\\(".r.findAllIn(opt).size
      assert(guards == 1, opt)
    }
  }

  test("soundness: identical rows with and without the rule (seeded pairs)") {
    val rnd = new scala.util.Random(0x1EE7L)
    val vocab = Seq("kettle", "kettel", "ketle", "bottle", "bott",
      "a", "abcdefghij", "", "spark", "spork")
    val pairs = Seq.fill(300)((vocab(rnd.nextInt(vocab.size)),
      vocab(rnd.nextInt(vocab.size))))
    val df = pairs.toDF("x", "y")
    def run() = df.filter(expr("levenshtein(x, y) <= 2"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val without = run()
    val withR = withRule(run())
    assert(withR == without && without.nonEmpty)
  }

  test("non-levenshtein filters are untouched") {
    withRule {
      val df = Seq(("abc", 1)).toDF("x", "n").filter(col("n") > 0)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.toLowerCase.contains("abs("), opt)
    }
  }

  test("q97's blocked linkage gains the prefilter through register()") {
    // register() installs the rule, so the fuzzy-linkage path picks it
    // up without opting in — and still matches its unguarded answer
    val docs = Seq("green kettle one", "green kettle oen", "green kettle zzzzzz")
      .toDF("p_name")
    val got = graft.ops.Dedup.fuzzyLinkPairs(docs, "p_name",
        element_at(split(col("p_name"), " "), 2), maxDist = 2)
      .select(col("val_a"), col("val_b")).as[(String, String)].collect().toSet
    assert(got == Set(("green kettle oen", "green kettle one")))
  }
}
