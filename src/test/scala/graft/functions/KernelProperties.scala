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
}
