package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class ExtensionsSpec extends AnyFunSuite with SparkTest {

  test("graft functions are SQL-callable in a registered session") {
    CatalystExpressions.register(spark)
    val dot = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val sh = spark.sql("SELECT graft_word_ngrams('a b c d', 2) AS sh")
      .head().getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
    val sim = spark.sql("SELECT graft_simhash(array('x','x','x')) AS s")
      .head().getLong(0)
    // all-identical tokens: simhash == the token hash's majority bits == hash itself
    assert(sim != 0L)
  }

  test("graft_ewma_fold rejects mistyped alpha/init at analysis time") {
    graft.functions.CatalystExpressions.register(spark)
    val rows = "array(named_struct('ts', 1L, 'id', 1L, 'xu', 100L))"
    // BIGINT alpha: was a runtime ClassCastException, must be an analysis error
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT graft_ewma_fold($rows, CAST(20 AS BIGINT), NULL)").collect()
    }
    assert(e1.getMessage.contains("alpha"))
    // INT init: same
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT graft_ewma_fold($rows, 20, 7)").collect()
    }
    assert(e2.getMessage.contains("init"))
    // well-typed calls still pass: NULL init and BIGINT init
    val ok1 = spark.sql(s"SELECT graft_ewma_fold($rows, 20, NULL) AS r")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(ok1.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 100L)))
    val ok2 = spark.sql(
      s"SELECT graft_ewma_fold($rows, 20, CAST(0 AS BIGINT)) AS r")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(ok2.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 20L)))
  }

  test("GraftExtensions injects every registered function at the extension point") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // registerFunctions is private[sql] at the Scala level; the bytecode
    // is public — go through reflection for the test
    val reg = ext.getClass
      .getMethod("registerFunctions", classOf[FunctionRegistry])
      .invoke(ext, FunctionRegistry.builtin.clone())
      .asInstanceOf[FunctionRegistry]
    // must stay in lockstep with CatalystExpressions.register: a session
    // built via the extensions path gets the same SQL surface
    Seq("graft_dot", "graft_minhash", "graft_simhash", "graft_simhash60",
      "graft_word_ngrams", "graft_bytehash", "graft_unscaled",
      "graft_make_decimal_38_6")
      .foreach { name =>
        assert(reg.functionExists(FunctionIdentifier(name)), name)
      }
  }
}
