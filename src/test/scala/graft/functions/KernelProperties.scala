package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side property checks over the compiled kernels' arithmetic —
  * no Spark jobs, large sample counts.
  *
  * The Count-Min hash family's documented contract is that its long
  * arithmetic NEVER wraps for any key at any permitted depth (that is
  * what makes the sketch exactly SQL-replayable); the depth cap was
  * tightened to 3000 precisely because row 3192's multiplier leaves
  * 2^32 and the product of a reduced key with it leaves the long range.
  * The property here recomputes the full formula in BigInt (which
  * cannot wrap) and asserts bit-equality across the whole key range at
  * the extreme permitted row — a wrap anywhere would diverge. */
class KernelProperties extends AnyFunSuite {

  private val P = 2147483647L
  private val A = 1103515245L
  private val B = 12345L
  private val Step = 1000003L

  private def cmHashLong(k: Long, r: Long, w: Long): Long = {
    val kr = java.lang.Math.floorMod(k, P)
    val m = kr * (A + r * Step) + B + r
    java.lang.Math.floorMod(java.lang.Math.floorMod(m, P), w)
  }

  private def cmHashBig(k: Long, r: Long, w: Long): Long = {
    val kr = ((BigInt(k) mod BigInt(P)) + P) mod BigInt(P)
    val m = kr * (BigInt(A) + BigInt(r) * Step) + B + r
    (((m mod BigInt(P)) + P) mod BigInt(P) mod BigInt(w)).toLong
  }

  test("cmHash long arithmetic never wraps for any key at any permitted depth") {
    val rnd = new scala.util.Random(11)
    val extremes = Seq(Long.MinValue, Long.MinValue + 1, -P - 1, -P, -1L,
      0L, 1L, P - 1, P, P + 1, Long.MaxValue - 1, Long.MaxValue)
    val keys = extremes ++ Seq.fill(5000)(rnd.nextLong())
    val rows = Seq(0L, 1L, 1499L, 2998L, 2999L) // full permitted depth range
    for (k <- keys; r <- rows; w <- Seq(2L, 64L, 65536L))
      assert(cmHashLong(k, r, w) == cmHashBig(k, r, w),
        s"wrap at key=$k row=$r width=$w")
  }

  test("cmHash WOULD wrap past the depth cap (the bound is tight, not paranoid)") {
    // row 3191 is the last safe multiplier; 3192 leaves 2^32 and a
    // near-P key wraps the product — exactly why depth is capped at 3000
    val k = P - 1
    assert(cmHashLong(k, 3191L, 65536L) == cmHashBig(k, 3191L, 65536L))
    assert(cmHashLong(k, 3192L, 65536L) != cmHashBig(k, 3192L, 65536L))
  }

  test("WordPairs equals the reference pair set for random token lists") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(23)
    val vocab = Array("", "a", "b", "c", "dd", "ee", "ff", "ggg")
    for (_ <- 1 to 300) {
      val toks = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
      val in = new GenericArrayData(
        toks.map(t => if (t == null) null else UTF8String.fromString(t)).toArray[Any])
      val got = CatalystExpressions.WordPairs(
          org.apache.spark.sql.catalyst.expressions.Literal(in,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType)))
        .nullSafeEval(in).asInstanceOf[GenericArrayData]
      val gotPairs = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
      }.toList
      val d = toks.filter(t => t != null && t.nonEmpty).distinct.sorted
      val want = (for {
        i <- d.indices; j <- (i + 1) until d.size
      } yield (d(i), d(j))).toList
      assert(gotPairs == want, s"tokens=$toks")
    }
  }

  test("VocabTokenize equals a reference greedy tokenizer for random texts") {
    import org.apache.spark.unsafe.types.UTF8String
    val vocab = Seq("ab", "abc", "b", "c", "ca", " ")
    // note 'a' is NOT in vocab: a bare 'a' (not starting ab/abc) is UNK
    def reference(text: String): (Long, Long, Long) = {
      val ids = vocab.zipWithIndex.map { case (t, i) => t -> (i + 1L) }.toMap
      var pos = 0; var n = 0L; var unk = 0L; var wsum = 0L
      while (pos < text.length) {
        val cand = (1 to math.min(3, text.length - pos)).reverse
          .map(l => text.substring(pos, pos + l)).find(ids.contains)
        n += 1
        cand match {
          case Some(t) => wsum += ids(t) * n; pos += t.length
          case None => unk += 1; pos += 1
        }
      }
      (n, unk, wsum)
    }
    val rnd = new scala.util.Random(0x70C3L)
    val expr = CatalystExpressions.VocabTokenize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(""),
        org.apache.spark.sql.types.StringType), vocab)
    for (_ <- 1 to 500) {
      val text = Seq.fill(rnd.nextInt(30))("abc x".charAt(rnd.nextInt(5))).mkString
      val got = expr.nullSafeEval(UTF8String.fromString(text))
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val want = reference(text)
      assert((got.getLong(0), got.getLong(1), got.getLong(2)) == want,
        s"text='$text'")
    }
    // fixed spot-checks: greedy prefers 'abc' over 'ab'; UNK for 'x'/'a'
    val g = expr.nullSafeEval(UTF8String.fromString("abca x"))
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    // abca x -> abc(2)@1, a=UNK(0)@2, ' '(6)@3, x=UNK(0)@4
    assert(g.getLong(0) == 4L && g.getLong(1) == 2L &&
      g.getLong(2) == 2L * 1 + 0L + 6L * 3 + 0L)
  }

  test("jaroWinkler kernel: textbook values, DuckDB-probed conventions") {
    def jw6(a: String, b: String) =
      math.round(CatalystExpressions.jaroWinkler(a, b) * 1e6) / 1e6
    // classic published values, cross-checked against DuckDB's
    // jaro_winkler_similarity (2026-08-14 probe, see JaroWinklerSim doc)
    assert(jw6("MARTHA", "MARHTA") == 0.961111)
    assert(jw6("DIXON", "DICKSONX") == 0.813333)
    assert(jw6("DWAYNE", "DUANE") == 0.84)
    assert(jw6("JELLYFISH", "SMELLYFISH") == 0.896296)
    // above the 0.7 jaro threshold WITH a shared prefix -> boosted
    assert(jw6("abcdefxxxx", "abcdefyyyy") == 0.84)
    // at/below the threshold: NO boost even with a 4-char prefix
    assert(jw6("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    // no shared prefix: boost is a no-op above the threshold
    assert(jw6("CRATE", "TRACE") == 0.733333)
    // conventions: empty -> 0 (DuckDB-probed), identity -> 1, symmetry
    assert(CatalystExpressions.jaroWinkler("", "") == 0.0)
    assert(CatalystExpressions.jaroWinkler("a", "") == 0.0)
    assert(CatalystExpressions.jaroWinkler("abc", "abc") == 1.0)
    assert(CatalystExpressions.jaroWinkler("abc", "xyz") == 0.0)
    val rnd = new scala.util.Random(0x1A20L)
    (1 to 200).foreach { _ =>
      val a = Seq.fill(1 + rnd.nextInt(12))(('a' + rnd.nextInt(4)).toChar).mkString
      val b = Seq.fill(1 + rnd.nextInt(12))(('a' + rnd.nextInt(4)).toChar).mkString
      val s = CatalystExpressions.jaroWinkler(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == CatalystExpressions.jaroWinkler(b, a), s"symmetry $a/$b")
    }
  }
}
