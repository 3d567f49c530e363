package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class QualitySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Long)].collect().toSeq

  test("rowAudit: one pass counts nulls, range breaks, and domain breaks") {
    val t = Seq(
      (Some(1L), Some(10.0), Some("F")),
      (None, Some(-5.0), Some("X")),       // null key, range, domain
      (Some(3L), None, None),              // null measure + null status: both violations
      (Some(4L), Some(99.0), Some("O"))
    ).toDF("k", "v", "st")
    val got = rows(Quality.rowAudit(t, Seq(
      Quality.notNull("k.not_null", $"k"),
      Quality.inRange("v.range", $"v", lit(0.0), lit(50.0)),
      Quality.inSet("st.domain", $"st", Seq("F", "O", "P")))))
    assert(got == Seq(
      ("k.not_null", 1L, 4L),
      ("v.range", 3L, 4L),   // -5 out of range, null v, 99 out of range
      ("st.domain", 2L, 4L)))
  }

  test("uniqueAudit counts every row of a duplicated key") {
    val t = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    assert(rows(Quality.uniqueAudit(t, "k.unique", Seq("k"))) ==
      Seq(("k.unique", 5L, 6L)))
  }

  test("fkAudit counts orphans including NULL foreign keys") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    assert(rows(Quality.fkAudit(child, "fk.ref", "fk", parent, "pk")) ==
      Seq(("fk.ref", 2L, 4L)))
  }

  test("fused keyedPass/keyedReport/fkRowAudit equals the composed audits") {
    val o = Seq(
      (Some(1L), Some(10.0), Some("F")),
      (Some(1L), Some(-5.0), Some("X")),   // dup key + range + domain
      (None, Some(20.0), Some("O")),       // null key
      (Some(3L), None, Some("P"))          // null measure
    ).toDF("k", "v", "st")
    val child = Seq((Some(1L), 5.0), (Some(9L), -1.0), (None, 3.0))
      .toDF("fk", "q")
    val oChecks = Seq(
      Quality.notNull("o.k.not_null", $"k"),
      Quality.inRange("o.v.range", $"v", lit(0.0), lit(50.0)),
      Quality.inSet("o.st.domain", $"st", Seq("F", "O", "P")))
    val cChecks = Seq(Quality.inRange("c.q.range", $"q", lit(0.0), lit(10.0)))
    val keyed = Quality.keyedPass(o, Seq("k"), oChecks)
    val fused = rows(Quality.report(Seq(
      Quality.keyedReport(keyed, "o.k.unique", oChecks),
      Quality.fkRowAudit(child, "c.fk.ref", "fk", keyed, "k", cChecks))))
    val composed = rows(Quality.report(Seq(
      Quality.rowAudit(o, oChecks),
      Quality.uniqueAudit(o, "o.k.unique", Seq("k")),
      Quality.fkAudit(child, "c.fk.ref", "fk", o, "k"),
      Quality.rowAudit(child, cChecks))))
    assert(fused == composed)
    // and the values are the expected ones, not accidentally-equal noise
    assert(fused == Seq(
      ("c.fk.ref", 2L, 3L),       // fk=9 orphan + NULL fk
      ("c.q.range", 1L, 3L),      // -1 out of range
      ("o.k.not_null", 1L, 4L),
      ("o.k.unique", 2L, 4L),     // both rows of k=1
      ("o.st.domain", 1L, 4L),
      ("o.v.range", 2L, 4L)))     // -5 + null v
  }

  test("report unions audits ordered; clean real tables audit to zero") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val got = rows(Quality.report(Seq(
      Quality.uniqueAudit(o, "b.unique", Seq("o_orderkey")),
      Quality.rowAudit(o, Seq(
        Quality.notNull("a.not_null", $"o_orderkey"))))))
    assert(got.map(_._1) == Seq("a.not_null", "b.unique"))
    assert(got.forall(_._2 == 0L))
    assert(got.forall(_._3 > 0L))
  }

  test("driftAudit: identical snapshots score l1x = 0; disjoint score 2*n_ref*n_cur") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val same = Quality.driftAudit(a, a, Seq("x"), bins = 4)
      .select($"l1x".cast("long")).as[Long].head()
    assert(same == 0L)
    // disjoint supports: every bin is exclusively one side's
    val lo = Seq(0.0, 0.1, 0.2).toDF("x")
    val hi = Seq(100.0, 100.1).toDF("x")
    val dis = Quality.driftAudit(lo, hi, Seq("x"), bins = 4)
      .select($"l1x".cast("long")).as[Long].head()
    assert(dis == 2L * 3L * 2L)
  }

  test("driftAudit: NULLs land in bin -1 and count as distribution drift") {
    val ref = Seq[Option[Double]](Some(1.0), Some(2.0)).toDF("x")
    val cur = Seq[Option[Double]](Some(1.0), Some(2.0), None, None).toDF("x")
    val row = Quality.driftAudit(ref, cur, Seq("x"), bins = 2)
      .select($"n_ref", $"n_cur", $"nulls_ref", $"nulls_cur",
        $"l1x".cast("long"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(row == ((2L, 4L, 0L, 2L,
      // bins: v=1 -> |1*4-1*2|=2, v=2 -> 2, null bin -> |0*4-2*2|=4
      8L)))
  }

  test("driftAudit: degenerate all-equal span bins to 0 on both snapshots") {
    val ref = Seq(5.0, 5.0).toDF("x")
    val cur = Seq(5.0).toDF("x")
    val row = Quality.driftAudit(ref, cur, Seq("x"), bins = 8)
      .select($"l1x".cast("long")).as[Long].head()
    assert(row == 0L) // |2*1 - 1*2| = 0
  }

  test("driftAudit: an empty snapshot yields NULL l1x, never a no-drift 0") {
    val ref = Seq(1.0, 2.0, 3.0).toDF("x")
    val cur = ref.filter($"x" > 100.0) // empty current snapshot
    val row = Quality.driftAudit(ref, cur, Seq("x"), bins = 4)
      .select($"n_ref", $"n_cur", $"l1x".cast("long"))
      .as[(Long, Long, Option[Long])].head()
    assert(row._1 == 3L && row._2 == 0L && row._3.isEmpty)
    // symmetric: empty reference
    val row2 = Quality.driftAudit(cur, ref, Seq("x"), bins = 4)
      .select($"l1x".cast("long")).as[Option[Long]].head()
    assert(row2.isEmpty)
  }

  test("profile: typed numeric min/max, null/distinct counts, modal " +
    "tie-break, all-NULL column") {
    val df = Seq(
      (2L, "b", "x", null.asInstanceOf[String]),
      (10L, "a", "y", null.asInstanceOf[String]),
      (10L, "b", "x", null.asInstanceOf[String]),
      (7L, null.asInstanceOf[String], "y", null.asInstanceOf[String])
    ).toDF("n", "s", "t", "z")
    val p = Quality.profile(df, Seq("n", "s", "t", "z"))
      .collect().map(r => r.getString(0) -> r).toMap
    // numeric column: min/max are TYPED (2 < 10), not lexicographic
    // ("10" < "2"); mode = 10 with count 2
    val n = p("n")
    assert(n.getLong(1) == 4L && n.getLong(2) == 0L && n.getLong(3) == 3L)
    assert(n.getString(4) == "2" && n.getString(5) == "10")
    assert(n.getString(6) == "10" && n.getLong(7) == 2L)
    // string column with one NULL: nulls counted, distinct over non-null,
    // mode = b (count 2)
    val s = p("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    assert(s.getString(6) == "b" && s.getLong(7) == 2L)
    // exact tie (x:2, y:2): the lexicographically LARGER value wins
    val t = p("t")
    assert(t.getString(6) == "y" && t.getLong(7) == 2L)
    // all-NULL column: distinct 0, NULL extremes and mode, top_n 0
    val z = p("z")
    assert(z.getLong(2) == 4L && z.getLong(3) == 0L)
    assert(z.isNullAt(4) && z.isNullAt(5) && z.isNullAt(6) && z.getLong(7) == 0L)
  }

  test("benfordAudit: cents-exact digit extraction, ppm shares, exclusions") {
    val df = Seq(Some(1.23), Some(0.10), Some(9.0), Some(-5.0), Some(0.0),
      None).toDF("v")
    val got = Quality.benfordAudit(df, $"v")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // digits: 1.23 -> c=123 -> 1; 0.10 -> c=10 -> 1; 9.0 -> c=900 -> 9;
    // negative/zero/NULL excluded; total 3
    assert(got == Seq(
      (1L, 2L, 666666L, 301030L, 365636L),
      (9L, 1L, 333333L, 45757L, 287576L)))
  }

  test("lDiversity: distinct-sensitive histogram with below-l classes flagged") {
    // group a: sens {x,x,x} -> 1 distinct; b: {x,y} -> 2; c: {x,y,z} -> 3
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("b", "x"), ("b", "y"),
      ("c", "x"), ("c", "y"), ("c", "z")).toDF("qi", "sens")
    val got = Quality.lDiversity(df, Seq($"qi"), $"sens", l = 2L)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false)))
  }

  test("kAnonymity: group-size histogram with at-risk classes") {
    // QI groups: (a,1)x1, (a,2)x3, (b,1)x3, (b,2)x5
    val df = (Seq(("a", 1)) ++ Seq.fill(3)(("a", 2)) ++ Seq.fill(3)(("b", 1)) ++
      Seq.fill(5)(("b", 2))).toDF("q1", "q2")
    val got = Quality.kAnonymity(df, Seq($"q1", $"q2"), k = 4L)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, true), (3L, 2L, true), (5L, 1L, false)))
  }

  test("tCloseness: hand-computed ordered EMD, m=1 degenerate, NULL sensitive excluded") {
    // groups A=[1,1,2], B=[2,2,2]; global (1->2, 2->4), N=6, m=2
    // A: cum_g=[2,3] vs cum=[2,6], |2*6-2*3|=6, den=3*6*1=18 -> 333333
    // B: cum_g=[0,3], |0*6-2*3|=6 -> same t; the NULL row must not count
    val df = Seq(
      ("A", Option(1L)), ("A", Option(1L)), ("A", Option(2L)),
      ("B", Option(2L)), ("B", Option(2L)), ("B", Option(2L)),
      ("B", Option.empty[Long])
    ).toDF("g", "v")
    val got = Quality.tCloseness(df, Seq("grp" -> col("g")), col("v"),
        tX1e6 = 300000L)
      .orderBy("grp").as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(("A", 3L, 333333L, true), ("B", 3L, 333333L, true)))
    // identical distributions -> t = 0 exactly
    val same = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L)).toDF("g", "v")
    val g1 = Quality.tCloseness(same, Seq("grp" -> col("g")), col("v"),
        tX1e6 = 0L)
      .orderBy("grp").as[(String, Long, Long, Boolean)].collect().toSeq
    assert(g1 == Seq(("A", 2L, 0L, false), ("B", 2L, 0L, false)))
    // one distinct sensitive value overall (m = 1): trivially 0-close
    // in the same pass (the full-prefix term is identically 0)
    val mono = Seq(("A", 5L), ("A", 5L), ("B", 5L)).toDF("g", "v")
    val g2 = Quality.tCloseness(mono, Seq("grp" -> col("g")), col("v"),
        tX1e6 = 0L)
      .orderBy("grp").as[(String, Long, Long, Boolean)].collect().toSeq
    assert(g2 == Seq(("A", 2L, 0L, false), ("B", 1L, 0L, false)))
  }

  test("keySkew: uniform -> Gini 0, concentrated -> (n-1)/n, empty -> NULLs") {
    // uniform: 4 keys x 3 rows -> gini_num must be 0
    val uni = (1 to 4).flatMap(k => Seq.fill(3)(("k" + k, 1)))
      .toDF("k", "v")
    val u = Quality.keySkew(uni, "k").collect().head
    assert(u.getLong(0) == 4L && u.getLong(1) == 12L)
    assert(u.getLong(2) == 250000L) // max share 3/12 = 250000 ppm
    assert(BigDecimal(u.getDecimal(3)) == 0)
    // all mass on one key among n=3 keys (two singletons, one heavy):
    // counts asc (1, 1, 10), T = 12: num = 2*(1+2+30) - 4*12 = 18,
    // den = 36 -> G = 1/2
    val skewed = (Seq.fill(10)(("h", 1)) ++ Seq(("a", 1), ("b", 1)))
      .toDF("k", "v")
    val s = Quality.keySkew(skewed, "k").collect().head
    assert(BigDecimal(s.getDecimal(3)) / BigDecimal(s.getDecimal(4)) ==
      BigDecimal(1) / 2)
    assert(s.getLong(2) == 833333L) // 10/12 in ppm, floored
    // empty input: one row, NULL diagnostics
    val e = Quality.keySkew(uni.filter(lit(false)), "k").collect().head
    assert(e.getLong(0) == 0L && e.isNullAt(2) && e.isNullAt(3))
  }
}
