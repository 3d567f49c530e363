package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, RuntimeReplaceable, TernaryExpression, UnaryExpression, UnscaledValue, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot inner loops of the similarity
  * and dedup operators. The composable alternatives (zip_with + aggregate
  * higher-order functions) are evaluated with one interpreted lambda call
  * per array element; these run the same folds as compiled while-loops over
  * the unsafe array data — ~10-40× faster per row, which is the difference
  * between the similarity pack being bench-viable at sf0.1 (and at 100 TB,
  * the difference between the scan being compute- or lambda-bound).
  *
  * Numeric contract: `DotProduct` folds strictly left-to-right from 0.0 —
  * exactly the fold the DuckDB oracles run via list_reduce — so swapping
  * the HOF implementation for these changes nothing in any result hash.
  */
object CatalystExpressions {

  /** dot(a, b) over array<double>: Σ a[i]·b[i], left fold, codegen'd. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  private val P = 2147483647L // 2^31 - 1, Mersenne prime

  /** Seeded-LCG universal-hash parameters shared with the documented
    * MinHash design: h_i(x) = (a_i·x + b_i) mod P. */
  private[graft] def minhashParams(k: Int): (Array[Long], Array[Long]) = {
    def stream(seed: Long) =
      Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)
    val a = stream(0x5eed5eedL).map(x => math.floorMod(x, P - 1) + 1).take(k).toArray
    val b = stream(0xfeedbeefL).map(x => math.floorMod(x, P)).take(k).toArray
    (a, b)
  }

  /** MinHash signature of an array<string> shingle set: array<long> of k
    * per-permutation minima. Empty input yields the all-P signature
    * (never collides with a real one). */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    private lazy val (pa, pb) = minhashParams(k)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val out = Array.fill(k)(P)
      val nSh = arr.numElements()
      var s = 0
      while (s < nSh) {
        val u8 = arr.getUTF8String(s)
        val h = math.floorMod(
          XXH64.hashUnsafeBytes(u8.getBaseObject, u8.getBaseOffset, u8.numBytes, 42L), P)
        var i = 0
        while (i < k) {
          val v = (pa(i) * h + pb(i)) % P
          if (v < out(i)) out(i) = v
          i += 1
        }
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash over an array<string> token multiset: bit j set iff a
    * strict majority of token hashes have bit j set. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      val n = arr.numElements()
      var s = 0
      while (s < n) {
        val u8 = arr.getUTF8String(s)
        val h = XXH64.hashUnsafeBytes(u8.getBaseObject, u8.getBaseOffset, u8.numBytes, 42L)
        var j = 0
        while (j < 64) { votes(j) += ((h >>> j) & 1L).toInt; j += 1 }
        s += 1
      }
      var sig = 0L
      var j = 0
      while (j < 64) { if (votes(j) * 2 > n) sig |= 1L << j; j += 1 }
      sig
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 60-bit *replayable* SimHash over an array<string> token multiset.
    *
    * Unlike [[SimHash64]] (xxhash64, fast but not expressible outside the
    * JVM), the token hash here is pure integer arithmetic — two chained
    * 31/37-base polynomial rolling hashes over the token's characters,
    * mod 1000000007 / 998244353, each finalized with one more affine
    * mix (raw folds of short tokens never reach the high bits), packed
    * into 60 bits as h1·2³⁰ + h2. Every step is replayable in ANSI
    * SQL/DuckDB, which makes SimHash near-dup pairs oracle-checkable
    * end-to-end (q21). Bit j is set iff a strict majority of token
    * hashes have bit j set.
    */
  case class SimHash60(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash60"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val votes = new Array[Int](60)
      var s = 0
      while (s < n) {
        val t = arr.getUTF8String(s).toString
        var h1 = 0L
        var h2 = 0L
        // iterate Unicode code points, not UTF-16 code units: the DuckDB
        // twin folds per character (string_split + ascii = code point), so
        // surrogate pairs must hash as one value on both sides
        var i = 0
        while (i < t.length) {
          val c = t.codePointAt(i).toLong
          h1 = (h1 * 31 + c) % 1000000007L
          h2 = (h2 * 37 + c) % 998244353L
          i += Character.charCount(c.toInt)
        }
        h1 = (h1 * 1103515245L + 12345L) % 1000000007L
        h2 = (h2 * 69069L + 1L) % 998244353L
        val h = h1 * 1073741824L + h2 // h1 << 30 | h2 (h2 < 2^30)
        var j = 0
        while (j < 60) { votes(j) += ((h >>> j) & 1L).toInt; j += 1 }
        s += 1
      }
      var sig = 0L
      var j = 0
      while (j < 60) { if (votes(j) * 2 > n) sig |= 1L << j; j += 1 }
      sig
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** mightContain over a serialized Bloom filter, codegen'd: the filter
    * bytes must be a FOLDABLE expression (a literal broadcast into the
    * plan — same pattern as the PQ codebooks), deserialized ONCE at plan
    * time into a task-shared reference object, so the per-row cost is
    * two hash mixes and k bit probes with zero allocation. This is the
    * scan-side half of ops/BloomJoin: a 100-TB scan drops sure-negative
    * rows BEFORE any exchange, and only maybe-positives pay the exact
    * join. Keys are LongType (the id-shaped case); false positives are
    * possible by construction — callers must close with an exact join —
    * false negatives are not. */
  case class BloomContains(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_bloom_contains"

    override def checkInputDataTypes(): TypeCheckResult = {
      val base = super.checkInputDataTypes()
      if (!base.isSuccess) base
      else if (!left.foldable)
        TypeCheckResult.TypeCheckFailure(
          "graft_bloom_contains requires a foldable (literal) filter")
      else TypeCheckResult.TypeCheckSuccess
    }

    @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(left.eval().asInstanceOf[Array[Byte]]))

    override def nullSafeEval(bin: Any, key: Any): Any =
      filter.mightContainLong(key.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftBloom", filter,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, (_, k) => s"${ev.value} = $ref.mightContainLong($k);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Polynomial rolling hash over the UTF-16 code units of a string:
    * fold(acc = 0; acc = (acc·31 + char) mod 1e9+7) — the ONE definition
    * shared by the Column path ([[graft.functions.TextFunctions.polyHash]]),
    * the driver-side twin (`TextAnalysis.polyHashLocal` — serve-time
    * partition pruning computes query-term buckets without a Spark job),
    * and [[CdcChunks]]' boundary rule, so index-build bucketing and
    * serve-time pruning can NEVER disagree, on any input. Equals the
    * DuckDB oracle's ascii()-per-split-char replay on all
    * basic-multilingual-plane text (a UTF-16 unit IS the code point
    * there); supplementary-plane input hashes surrogate halves —
    * engine-self-consistent, oracle-divergent (documented contract).
    * The fold never goes negative (code units are unsigned), so
    * `hash % n == pmod(hash, n)` for bucket math. */
  case class PolyHash(child: Expression) extends UnaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_poly_hash"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      var acc = 0L
      var i = 0
      while (i < s.length) {
        acc = (acc * 31 + s.charAt(i)) % 1000000007L
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => {
        val str = ctx.freshName("str")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |java.lang.String $str = $s.toString();
           |long $acc = 0L;
           |for (int $i = 0; $i < $str.length(); $i++) {
           |  $acc = ($acc * 31L + $str.charAt($i)) % 1000000007L;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Polynomial rolling hash over the BYTES of a binary column:
    * Σ b·31^i mod 1e9+7, left-to-right — the binary twin of
    * TextFunctions.polyHash (equal on pure-ASCII payloads), codegen'd so
    * binary feature extraction stays a plain Project (no object
    * deserialization boundary). */
  case class BytePolyHash(child: Expression) extends UnaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_bytehash"

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      var acc = 0L
      var i = 0
      while (i < bytes.length) {
        acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b => {
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |long $acc = 0L;
           |for (int $i = 0; $i < $b.length; $i++) {
           |  $acc = ($acc * 31L + ($b[$i] & 0xff)) % 1000000007L;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Distinct word n-gram shingles of a single-space-separated string, in
    * first-occurrence order — the compiled form of the transform/slice/
    * concat_ws/array_distinct HOF chain (which costs ~16µs per shingle
    * interpreted; this is the scan-dominant cost of every shingle-based
    * dedup operator). */
  case class WordNGrams(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_word_ngrams"

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      val words = text.split(' ')
      if (words.length < n) {
        new GenericArrayData(Array.empty[Any])
      } else {
        val seen = new java.util.LinkedHashSet[String]()
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i <= words.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j))
            j += 1
          }
          seen.add(sb.toString)
          i += 1
        }
        val out = new Array[Any](seen.size())
        val it = seen.iterator()
        var k2 = 0
        while (it.hasNext) {
          out(k2) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
          k2 += 1
        }
        new GenericArrayData(out)
      }
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Per-subspace PQ squared-distance tables, fused into one pass: element
    * c of output array j = Σ_i (v[j·dsub+i]/nrm − cent_{j,c,i})², the acc
    * summed strictly left-to-right — bit-identical to the HOF chain it
    * replaces (slice → zip_with diff → DotProduct per centroid), which
    * allocated m·ks diff arrays per row and was the two largest bench
    * entries (q71 8.7×, q74 10.5× vs oracle). The codebook rides in the
    * expression as plain JVM arrays (flattened [j][c][i]), not a child,
    * so the inner loop is m·ks·dsub fused multiply-adds with zero
    * allocation beyond the output. */
  case class PqDistTable(vec: Expression, nrm: Expression, flat: Array[Double],
      m: Int, ks: Int) extends BinaryExpression with CodegenFallback {
    override def left: Expression = vec
    override def right: Expression = nrm
    private val dsub = flat.length / (m * ks)
    override def dataType: DataType =
      ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
    override def prettyName: String = "graft_pq_tabs"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val nr = b.asInstanceOf[Double]
      val out = new Array[Any](m)
      var j = 0
      var base = 0
      while (j < m) {
        val tab = new Array[Any](ks)
        val off = j * dsub
        var c = 0
        while (c < ks) {
          var acc = 0.0
          var i = 0
          while (i < dsub) {
            val diff = arr.getDouble(off + i) / nr - flat(base + c * dsub + i)
            acc += diff * diff
            i += 1
          }
          tab(c) = acc
          c += 1
        }
        out(j) = new GenericArrayData(tab)
        base += ks * dsub
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(vec = l, nrm = r)
  }

  /** PQ codes in the same fused pass: code j = argmin over c of the
    * [[PqDistTable]] distance, FIRST minimum on exact ties (strict `<`
    * keeps the earliest index — the array_position(array_min) order the
    * oracle replays). */
  case class PqEncode(vec: Expression, nrm: Expression, flat: Array[Double],
      m: Int, ks: Int) extends BinaryExpression with CodegenFallback {
    override def left: Expression = vec
    override def right: Expression = nrm
    private val dsub = flat.length / (m * ks)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_pq_codes"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val nr = b.asInstanceOf[Double]
      val out = new Array[Any](m)
      var j = 0
      var base = 0
      while (j < m) {
        val off = j * dsub
        var best = Double.MaxValue
        var bestC = 0
        var c = 0
        while (c < ks) {
          var acc = 0.0
          var i = 0
          while (i < dsub) {
            val diff = arr.getDouble(off + i) / nr - flat(base + c * dsub + i)
            acc += diff * diff
            i += 1
          }
          if (acc < best) { best = acc; bestC = c }
          c += 1
        }
        out(j) = bestC
        base += ks * dsub
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(vec = l, nrm = r)
  }

  /** ADC distance: Σ_j tabs[j][codes[j]], left fold from 0.0 — the
    * compiled twin of aggregate(zip_with(codes, tabs, (c, t) ⇒
    * element_at(t, c+1)), 0.0, _+_), which is evaluated as an interpreted
    * lambda per CANDIDATE PAIR (the multiplied hot path of the PQ scan:
    * |corpus| × |queries| evaluations, where the encode runs only
    * |corpus| + |queries| times). */
  case class AdcDistance(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_pq_adc"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val codes = a.asInstanceOf[ArrayData]
      val tabs = b.asInstanceOf[ArrayData]
      val n = math.min(codes.numElements(), tabs.numElements())
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += tabs.getArray(j).getDouble(codes.getInt(j))
        j += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c, t) => {
        val j = ctx.freshName("j")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($c.numElements(), $t.numElements());
           |double $acc = 0.0;
           |for (int $j = 0; $j < $n; $j++) {
           |  $acc += $t.getArray($j).getDouble($c.getInt($j));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Builder shared by the registry entries: the codebook/m/ks arguments
    * arrive as foldable literals and are evaluated ONCE at resolution into
    * the plain arrays the row loop reads. */
  private def pqArgs(es: Seq[Expression]): (Expression, Expression, Array[Double], Int, Int) = {
    val flat = es(2).eval().asInstanceOf[ArrayData].toDoubleArray()
    val m = es(3).eval().asInstanceOf[Int]
    val ks = es(4).eval().asInstanceOf[Int]
    require(m > 0 && ks > 0 && flat.length % (m * ks) == 0,
      s"codebook length ${flat.length} not divisible by m*ks=${m * ks}")
    (es.head, es(1), flat, m, ks)
  }

  def pqDistTable(es: Seq[Expression]): Expression = {
    val (v, n, flat, m, ks) = pqArgs(es); PqDistTable(v, n, flat, m, ks)
  }
  def pqEncode(es: Seq[Expression]): Expression = {
    val (v, n, flat, m, ks) = pqArgs(es); PqEncode(v, n, flat, m, ks)
  }

  /** Non-overlapping `width`-word chunk tiling of a single-space-separated
    * string — the compiled form of transform(sequence(0, n/width − 1),
    * i ⇒ array_join(slice(words, i·width+1, width), " ")), which costs one
    * interpreted slice+join lambda per chunk and dominated the
    * chunk-dedup scan. Split keeps trailing empty tokens (limit −1),
    * matching both functions.split and the oracle's string_split. */
  case class WordChunks(child: Expression, width: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_word_chunks"

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      val words = text.split(" ", -1)
      val n = words.length / width
      val out = new Array[Any](n)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < n) {
        sb.setLength(0)
        var j = 0
        while (j < width) {
          if (j > 0) sb.append(' ')
          sb.append(words(i * width + j))
          j += 1
        }
        out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Overlapping `width`-word windows at `stride`-word steps — the
    * context-window segmentation of long documents (training-chunk /
    * retrieval-passage splitting). Window i covers words
    * [i·stride, min(i·stride+width, n)); the window count
    * ceil(max(n−width,0)/stride)+1 guarantees every word is covered and
    * the last window is the only short one. stride = width degenerates
    * to [[WordChunks]]' non-overlapping tiling; stride < width yields
    * width−stride words of overlap between neighbors. Split keeps
    * trailing empty tokens (limit −1) like the oracle's string_split. */
  case class WordWindows(child: Expression, width: Int, stride: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_word_windows"

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      val words = text.split(" ", -1)
      val n = words.length
      val nw = (math.max(n - width, 0) + stride - 1) / stride + 1
      val out = new Array[Any](nw)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < nw) {
        val start = i * stride
        val end = math.min(start + width, n)
        sb.setLength(0)
        var j = start
        while (j < end) {
          if (j > start) sb.append(' ')
          sb.append(words(j))
          j += 1
        }
        out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD 2003) of an
    * array<string> token sequence: hash every `k`-token gram (xxhash64
    * chain over the token hashes — order-sensitive, content-only), keep
    * the MINIMUM of each sliding window of `w` consecutive gram hashes
    * (monotonic-deque, O(n)), return the distinct minima in first-seen
    * order. Content-only selection is what gives the MOSS guarantee:
    * two documents sharing any w+k−1-token span select at least one
    * identical fingerprint VALUE (hash collisions can only add shared
    * fingerprints, never lose one — the window's min value is the same
    * number in both docs whichever gram produced it). One fused JVM
    * loop per row replaces a nested interpreted higher-order-function
    * tree that recomputed every gram hash w times (q199: the
    * fingerprint scan was the dominant stage cost). */
  case class GramWinnow(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_winnow"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val ng = n - k + 1
      if (ng < w) return new GenericArrayData(Array.empty[Long])
      val th = new Array[Long](n)
      var i = 0
      while (i < n) {
        val u8 = arr.getUTF8String(i)
        th(i) = XXH64.hashUnsafeBytes(
          u8.getBaseObject, u8.getBaseOffset, u8.numBytes, 42L)
        i += 1
      }
      val gh = new Array[Long](ng)
      i = 0
      while (i < ng) {
        var h = 0x9E3779B97F4A7C15L
        var j = 0
        while (j < k) { h = XXH64.hashLong(th(i + j), h); j += 1 }
        gh(i) = h
        i += 1
      }
      val nw = ng - w + 1
      val mins = new Array[Long](nw)
      val dq = new Array[Int](ng) // indices, gh increasing from head
      var head = 0
      var tail = 0
      i = 0
      while (i < ng) {
        while (tail > head && gh(dq(tail - 1)) >= gh(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) mins(i - w + 1) = gh(dq(head))
        i += 1
      }
      val seen = new java.util.HashSet[java.lang.Long]()
      val out = Array.newBuilder[Long]
      var p = 0
      while (p < nw) { if (seen.add(mins(p))) out += mins(p); p += 1 }
      new GenericArrayData(out.result())
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Content-defined chunking of a single-space-separated word stream —
    * the SHIFT-ROBUST passage splitter (FastCDC/rsync family, word
    * granularity): a chunk boundary falls AFTER word w iff
    * polyHash(w) mod divisor == 0, where polyHash is the
    * [[graft.functions.TextFunctions.polyHash]] char fold
    * ((acc·31 + codepoint) mod 1e9+7) so the boundary rule replays in any
    * SQL engine. Because a boundary depends only on the word AT the
    * boundary — never on absolute position — inserting or deleting words
    * re-synchronizes the chunking at the next boundary, so two documents
    * differing by one early edit still share every later chunk;
    * [[WordChunks]]' fixed tiling shifts every subsequent tile and
    * shares none. Every word lands in exactly one chunk (a boundary word
    * CLOSES its chunk); the trailing chunk is emitted iff non-terminated.
    * Expected chunk length = divisor words (hash residues are
    * near-uniform). Split keeps empty tokens (limit −1) like the oracle's
    * string_split; an empty word hashes to 0 ≡ 0 and is always a
    * boundary. */
  case class CdcChunks(child: Expression, divisor: Int)
      extends UnaryExpression with CodegenFallback {
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_cdc_chunks"

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      val words = text.split(" ", -1)
      val out = new scala.collection.mutable.ArrayBuffer[Any]()
      val sb = new java.lang.StringBuilder()
      var open = false
      var i = 0
      while (i < words.length) {
        if (open) sb.append(' ')
        sb.append(words(i))
        open = true
        val w = words(i)
        var h = 0L
        var j = 0
        while (j < w.length) { h = (h * 31 + w.charAt(j)) % 1000000007L; j += 1 }
        if (h % divisor == 0) {
          out += org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
          sb.setLength(0)
          open = false
        }
        i += 1
      }
      if (open)
        out += org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Greedy longest-match subword tokenizer against a FIXED vocabulary —
    * the WordPiece/BPE-apply shape (tokenizers ship as a vocab file;
    * applying one is the exact-token-count step packing and budget
    * accounting need, where the whitespace/regex counters are
    * approximations): at each position take the LONGEST vocab entry
    * matching, else consume one char as UNK (id 0). Ids are 1-based
    * positions in the given vocab list. Returns
    * struct(n_tokens, n_unk, id_wsum) with id_wsum = Σ idᵢ·i (1-based
    * token position) — an order-sensitive checksum replayable by a
    * plain SUM in any SQL engine, so the whole tokenization is
    * hash-checkable without materializing token arrays. In-row and
    * shuffle-free like [[WordCounts]]; the hash probes run longest-
    * first so cost per position is ≤ maxTokLen lookups. */
  case class VocabTokenize(child: Expression, vocab: Seq[String])
      extends UnaryExpression with CodegenFallback {
    require(vocab.nonEmpty && vocab.forall(_.nonEmpty),
      "vocab must be non-empty tokens")
    require(vocab.distinct.size == vocab.size, "vocab tokens must be distinct")
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_unk", LongType, nullable = false),
      StructField("id_wsum", LongType, nullable = false)))
    override def prettyName: String = "graft_vocab_tokenize"

    @transient private lazy val byTok: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      vocab.zipWithIndex.foreach { case (t, i) => m.put(t, (i + 1).toLong) }
      m
    }
    @transient private lazy val maxLen = vocab.map(_.length).max

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      var pos = 0
      var n = 0L
      var unk = 0L
      var wsum = 0L
      while (pos < text.length) {
        var len = math.min(maxLen, text.length - pos)
        var id = -1L
        while (len >= 1 && id < 0) {
          val hit = byTok.get(text.substring(pos, pos + len))
          if (hit != null) id = hit.longValue() else len -= 1
        }
        if (id < 0) { unk += 1; id = 0L; len = 1 }
        n += 1
        wsum += id * n
        pos += len
      }
      org.apache.spark.sql.catalyst.InternalRow(n, unk, wsum)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Viterbi segmentation of a word under a unigram LM with INTEGER
    * (1e-6-quantized log-prob) piece scores — the E-step kernel of
    * SentencePiece-style tokenizer learning (Kudo 2018, hard-EM
    * variant): maximize Σ score(pieceᵢ) over all decompositions into
    * vocab pieces of length ≤ maxLen. Integer scores make the DP
    * EXACTLY correct (float Viterbi is not prefix-monotone under
    * reordering) and the whole fixed point SQL-replayable. Ties break
    * by fewer pieces, then smallest predecessor at every DP cell —
    * which equals, at the path level, lexicographically-ascending
    * REVERSED start-position sequence (a DP candidate's breakpoint
    * list ends at the cell, so comparing from the end resolves exactly
    * the cells the DP resolves, and equal (score, n) forces equal list
    * length) — the key a SQL oracle replays as ORDER BY score DESC,
    * n ASC, list_reverse(brk) ASC. All indexing is by CODEPOINT (like
    * Spark's substr and DuckDB's substr/length), not UTF-16 code unit,
    * so supplementary-plane corpora segment identically in both
    * engines. Returns the best segmentation as array<string>; null
    * only if some character is outside the vocab (callers keep the
    * charset in the vocab, so coverage is total). One JVM loop per
    * row, O(len · maxLen) probes. */
  case class UnigramViterbi(child: Expression, pieces: Seq[String],
      scores: Seq[Long], maxLen: Int)
      extends UnaryExpression with CodegenFallback {
    require(pieces.nonEmpty, "unigram vocab must be non-empty")
    require(pieces.size == scores.size, "pieces and scores must align")
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    // null for an unsegmentable word regardless of input nullability —
    // without this the codegen'd projection NPEs on a non-null child
    override def nullable: Boolean = true
    override def prettyName: String = "graft_unigram_viterbi"

    @transient private lazy val byPiece: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      pieces.iterator.zip(scores.iterator).foreach { case (p, q) => m.put(p, q) }
      m
    }

    override def nullSafeEval(input: Any): Any = {
      val w = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      val seg = viterbiSegment(w, byPiece, maxLen)
      if (seg == null) return null
      val out = new Array[Any](seg.length)
      var t = 0
      while (t < seg.length) {
        out(t) = org.apache.spark.unsafe.types.UTF8String.fromString(seg(t))
        t += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** The DP behind [[UnigramViterbi]], shared with the driver-side EM
    * loop engine ([[graft.ops.TextAnalysis.unigramLearn]]) so the two
    * loop engines cannot drift: one implementation, two call sites.
    * Returns the best segmentation, or null if some character is not
    * in the piece map. */
  private[graft] def viterbiSegment(w: String,
      byPiece: java.util.HashMap[String, java.lang.Long],
      maxLen: Int): Array[String] = {
    // codepoint boundaries: offs(k) = UTF-16 index of codepoint k
    val nu = w.length
    val offs = new Array[Int](nu + 1)
    var n = 0
    var u = 0
    while (u < nu) { offs(n) = u; u += Character.charCount(w.codePointAt(u)); n += 1 }
    offs(n) = nu
    val NEG = Long.MinValue
    val sc = new Array[Long](n + 1)
    val nn = new Array[Int](n + 1)
    val prev = new Array[Int](n + 1)
    java.util.Arrays.fill(sc, NEG)
    sc(0) = 0L
    var i = 1
    while (i <= n) {
      var len = 1
      val lmax = math.min(maxLen, i)
      while (len <= lmax) {
        val j = i - len
        if (sc(j) != NEG) {
          val q = byPiece.get(w.substring(offs(j), offs(i)))
          if (q != null) {
            val s = sc(j) + q.longValue()
            val m = nn(j) + 1
            if (sc(i) == NEG || s > sc(i) || (s == sc(i) &&
                (m < nn(i) || (m == nn(i) && j < prev(i))))) {
              sc(i) = s; nn(i) = m; prev(i) = j
            }
          }
        }
        len += 1
      }
      i += 1
    }
    if (sc(n) == NEG) return null
    val out = new Array[String](nn(n))
    var p = n
    var t = nn(n) - 1
    while (p > 0) {
      val j = prev(p)
      out(t) = w.substring(offs(j), offs(p))
      t -= 1; p = j
    }
    out
  }

  /** Per-row term-frequency map of an array<string> token list:
    * array<struct<term, tf>> sorted by term, empty tokens skipped — the
    * in-row form of `explode → groupBy(doc, term) → count`. Term counts
    * within a document are row-local by definition, so computing them in
    * the scan projection removes the per-TOKEN exchange entirely (the
    * largest shuffle of the TF-IDF pipeline: T token rows vs the T'
    * distinct (doc, term) pairs that actually need to move). */
  case class WordCounts(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_word_counts"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new java.util.TreeMap[String, Array[Long]]()
      var i = 0
      while (i < n) {
        val t = arr.getUTF8String(i).toString
        if (t.nonEmpty) {
          val c = counts.get(t)
          if (c == null) counts.put(t, Array(1L)) else c(0) += 1L
        }
        i += 1
      }
      val out = new Array[Any](counts.size())
      val it = counts.entrySet().iterator()
      var j = 0
      while (it.hasNext) {
        val e = it.next()
        out(j) = org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(e.getKey), e.getValue()(0))
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** All ordered pairs of the DISTINCT non-empty strings in the input
    * array, lexicographically sorted (ta < tb) — the in-row pair
    * generation for term co-occurrence mining
    * (ops/TextAnalysis.termLift). Compiled for the same reason as
    * WordWindows: the declarative
    * `flatten(transform(ts, (a,i) -> transform(slice(...), ...)))` nest
    * is interpreted per ELEMENT and re-slices the array per anchor —
    * O(d²) interpreter round-trips and array copies per row, where this
    * kernel is one TreeSet fill plus one nested while loop. Dedup and
    * sort happen here (TreeSet — same Java-String order as WordCounts'
    * TreeMap), so callers may pass raw word arrays or already-distinct
    * term arrays interchangeably. */
  case class WordPairs(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("ta", StringType, nullable = false),
      StructField("tb", StringType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_word_pairs"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val terms = new java.util.TreeSet[String]()
      var i = 0
      while (i < n) {
        val u8 = arr.getUTF8String(i) // null ELEMENTS skip like empties
        if (u8 != null) {
          val t = u8.toString
          if (t.nonEmpty) terms.add(t)
        }
        i += 1
      }
      val d = terms.size()
      // d·(d−1)/2 output pairs: past ~46k distinct terms the pair array
      // exceeds Int range — a pathological doc; bound the vocabulary
      // upstream (termLift's docstring) rather than wrap silently
      require(d <= 20000,
        s"graft_word_pairs: $d distinct terms in one row (> 20000) — " +
          "prefilter the vocabulary before pair generation")
      val sorted = terms.toArray(new Array[String](d))
      val out = new Array[Any](d * (d - 1) / 2)
      var j = 0
      var a = 0
      while (a < d) {
        val ua = org.apache.spark.unsafe.types.UTF8String.fromString(sorted(a))
        var b = a + 1
        while (b < d) {
          out(j) = org.apache.spark.sql.catalyst.InternalRow(
            ua, org.apache.spark.unsafe.types.UTF8String.fromString(sorted(b)))
          j += 1
          b += 1
        }
        a += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** All ordered pairs (a < b) of the DISTINCT longs in the input array —
    * the in-row pair generation for basket co-occurrence mining
    * (ops/Recs.coVisitation): the long-typed twin of [[WordPairs]], same
    * compiled-kernel rationale (the declarative transform/slice nest is
    * interpreted per element and re-slices per anchor). Input arrays are
    * expected already distinct+sorted (the caller groups with
    * sort_array(collect_set)); the kernel re-sorts defensively so raw
    * arrays are also accepted. */
  case class LongPairs(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_long_pairs"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val set = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) set.add(arr.getLong(i))
        i += 1
      }
      val d = set.size()
      // d·(d−1)/2 output pairs: a pathological basket (a bot cart with
      // tens of thousands of distinct items) would blow the row quadratic
      // — bound baskets upstream (Recs.coVisitation's maxBasket slice)
      // rather than wrap silently
      require(d <= 20000,
        s"graft_long_pairs: $d distinct items in one row (> 20000) — " +
          "cap the basket before pair generation")
      val sorted = new Array[Long](d)
      val it = set.iterator()
      var j = 0
      while (it.hasNext) { sorted(j) = it.next(); j += 1 }
      val out = new Array[Any](d * (d - 1) / 2)
      j = 0
      var a = 0
      while (a < d) {
        var b = a + 1
        while (b < d) {
          out(j) = org.apache.spark.sql.catalyst.InternalRow(sorted(a), sorted(b))
          j += 1
          b += 1
        }
        a += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** One O(n) pass of the EWMA recurrence over a key's time-sorted rows:
    * y_1 = x_1 (or `(a·x_1 + b·init) div 100` when an `init` state from a
    * previous segment is present), y_t = (a·x_t + b·y_{t−1}) div 100 in
    * integer units, a = alphaNum, b = 100−a — the compiled form of the
    * aggregate-HOF fold whose `concat(acc, array(...))` accumulator
    * copied the growing output array on every row (O(n²) time and
    * allocation per key; hot keys degraded sharply). Division is Java
    * long `/` — identical to Spark's `div` (truncation toward zero) that
    * the HOF used, so swapping implementations changes no result hash.
    *
    * Input: array<struct<ts, id: long, xu: long>> ALREADY sorted (the
    * caller sort_arrays by (ts, id)); fields are read by ordinal 1/2, the
    * ts field only drives the sort. `init` is the chained boundary state
    * for segmented evaluation (ops/TimeSeries.ewmaSegmented); NULL means
    * "no prior state" and the first row passes through. */
  case class EwmaFold(rows: Expression, alpha: Expression, init: Expression)
      extends TernaryExpression with CodegenFallback {
    override def first: Expression = rows
    override def second: Expression = alpha
    override def third: Expression = init
    override def nullable: Boolean = rows.nullable
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("y", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_ewma_fold"

    override def checkInputDataTypes(): TypeCheckResult = rows.dataType match {
      case ArrayType(st: StructType, _) if st.length == 3 &&
        st(1).dataType == LongType && st(2).dataType == LongType =>
        // alpha/init are read by asInstanceOf in eval — reject wrong
        // types at ANALYSIS time, not as a runtime ClassCastException
        // (a SQL caller passing a BIGINT alpha must get an AnalysisError)
        if (alpha.dataType != IntegerType) TypeCheckResult.TypeCheckFailure(
          s"graft_ewma_fold expects alpha: int, got ${alpha.dataType.catalogString}")
        else if (init.dataType != LongType && init.dataType != NullType)
          TypeCheckResult.TypeCheckFailure(
            s"graft_ewma_fold expects init: bigint (or NULL), got ${init.dataType.catalogString}")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_ewma_fold expects array<struct<ts, id: bigint, xu: bigint>>, " +
          s"got ${other.catalogString}")
    }

    // eval is overridden (not nullSafeEval): init is legitimately NULL
    // for the unseeded first segment, and TernaryExpression's default
    // would short-circuit the whole fold to NULL
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val rs = rows.eval(input)
      if (rs == null) return null
      val arr = rs.asInstanceOf[ArrayData]
      val a = alpha.eval(input).asInstanceOf[Int].toLong
      val b = 100L - a
      val i0 = init.eval(input)
      val n = arr.numElements()
      val out = new Array[Any](n)
      var has = i0 != null
      var prev = if (has) i0.asInstanceOf[Long] else 0L
      var i = 0
      while (i < n) {
        val r = arr.getStruct(i, 3)
        val xu = r.getLong(2)
        val y = if (has) (a * xu + b * prev) / 100L else { has = true; xu }
        prev = y
        out(i) = org.apache.spark.sql.catalyst.InternalRow(r.getLong(1), y)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildrenInternal(f: Expression, s: Expression,
        t: Expression): Expression = copy(rows = f, alpha = s, init = t)
  }

  /** [[UnscaledValue]] constrained to scale-6 decimals — the registered
    * `graft_unscaled`. Catalyst's raw UnscaledValue is scale-blind:
    * applied to a decimal whose scale is not 6 it silently mis-scales
    * every downstream money total by a power of 10 (the partner
    * `graft_make_decimal_38_6` always reattaches scale 6), so the
    * library's SQL surface rejects other scales at analysis time. */
  case class UnscaledMicros(child: Expression) extends RuntimeReplaceable
      with UnaryLike[Expression] {
    override lazy val replacement: Expression = UnscaledValue(child)
    override def prettyName: String = "graft_unscaled"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case d: DecimalType if d.scale == 6 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_unscaled expects DECIMAL(p, 6) micros input, got " +
          other.catalogString)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Jaro-Winkler similarity kernel — the textbook algorithm with the
    * parameters every mainstream implementation (and DuckDB's
    * `jaro_winkler_similarity`, which the oracle replays) uses:
    * matching window `max(|a|,|b|)/2 − 1`, transpositions = half the
    * out-of-order matched positions, Winkler prefix boost capped at 4
    * chars with weight 0.1 applied only when jaro > 0.7, and 0.0 when
    * either string is empty (the DuckDB convention — probed, not
    * assumed). Exactness across engines: every jaro/jw value is a
    * rational with denominator ≤ 30·|a|·|b| — far below the 2·10⁶ a
    * 6-decimal rounding boundary would need — so `round(…, 6)` of the
    * IEEE result is engine-identical whenever the semantics match.
    * Operates on Java chars (= bytes for ASCII; non-ASCII semantics
    * follow UTF-16 code units, DuckDB's follow bytes — block on an
    * ASCII key when linking non-ASCII corpora). Static forwarder so
    * generated code calls it directly. */
  def jaroWinkler(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: matched chars compared in order
    var halfT = 0
    var j2 = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j2)) j2 += 1
        if (s1.charAt(i) != s2.charAt(j2)) halfT += 1
        j2 += 1
      }
      i += 1
    }
    val t = halfT / 2.0
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val maxL = math.min(4, math.min(l1, l2))
      while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  /** [[jaroWinkler]] as a codegen'd Catalyst expression over two string
    * columns (the compiled scorer behind `Dedup.fuzzyLinkPairsScored`):
    * generated code calls the static kernel — no lambda, no UDF
    * serialization, null-safe. */
  case class JaroWinklerSim(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaro_winkler"

    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinkler(a.toString, b.toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.CatalystExpressions.jaroWinkler(" +
          s"$a.toString(), $b.toString());")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Greedy time-throttle fold over one key's chronologically sorted
    * rows — the debounce/rate-limit recurrence (alert dedup,
    * notification caps, retry suppression): keep a row iff at least
    * `gap` µs have elapsed since the last KEPT row. Like [[EwmaFold]],
    * row t depends on prior OUTPUT (which rows were kept), which no
    * window frame expresses — the kernel is one O(n) pass carrying a
    * single long (the last kept timestamp). `init` seeds that state for
    * segmented/incremental folds (NULL = no prior kept row; the
    * ewmaSegmented construction applies verbatim). Input rows must be
    * pre-sorted array<struct<tsu: long, id: long>>; output one
    * struct<id, kept> per input row, order preserved. */
  case class ThrottleFold(rows: Expression, gap: Expression, init: Expression)
      extends TernaryExpression with CodegenFallback {
    override def first: Expression = rows
    override def second: Expression = gap
    override def third: Expression = init
    override def nullable: Boolean = rows.nullable
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("kept", BooleanType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_throttle_fold"

    override def checkInputDataTypes(): TypeCheckResult = rows.dataType match {
      case ArrayType(st: StructType, _) if st.length == 2 &&
        st(0).dataType == LongType && st(1).dataType == LongType =>
        if (gap.dataType != LongType) TypeCheckResult.TypeCheckFailure(
          s"graft_throttle_fold expects gap: bigint, got ${gap.dataType.catalogString}")
        else if (init.dataType != LongType && init.dataType != NullType)
          TypeCheckResult.TypeCheckFailure(
            s"graft_throttle_fold expects init: bigint (or NULL), got ${init.dataType.catalogString}")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_throttle_fold expects array<struct<tsu: bigint, id: bigint>>, " +
          s"got ${other.catalogString}")
    }

    // eval (not nullSafeEval): init is legitimately NULL for the
    // unseeded first segment (the EwmaFold precedent)
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val rs = rows.eval(input)
      if (rs == null) return null
      val arr = rs.asInstanceOf[ArrayData]
      val g = gap.eval(input).asInstanceOf[Long]
      val i0 = init.eval(input)
      var has = i0 != null
      var last = if (has) i0.asInstanceOf[Long] else 0L
      val n = arr.numElements()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        val r = arr.getStruct(i, 2)
        val t = r.getLong(0)
        val kept = !has || t - last >= g
        if (kept) { has = true; last = t }
        out(i) = org.apache.spark.sql.catalyst.InternalRow(r.getLong(1), kept)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildrenInternal(f: Expression, s: Expression,
        t: Expression): Expression = copy(rows = f, gap = s, init = t)
  }

  /** First word-aligned occurrence of each of a fixed set of phrases —
    * ONE Aho–Corasick automaton pass per row over ` text ` (padded), the
    * multi-pattern matcher exact-substring decontamination needs: with
    * P probe phrases (benchmark answer strings, canary GUIDs, blocked
    * passages) a per-phrase `strpos` family scans the 100 TB corpus P
    * times where this kernel scans it ONCE, independent of P.
    *
    * Contract (chosen for exact SQL replay): match positions are
    * 1-based character offsets into `' ' || text || ' '`, identical to
    * DuckDB/ANSI `strpos(' '||text||' ', ' '||phrase||' ')`; word
    * alignment comes from the space padding on both the haystack and
    * every needle. Output: array<struct<pid, pos>> of the phrases that
    * occur (pid = 1-based index into the phrase list, ascending; absent
    * phrases emit nothing). The automaton is built once per executor
    * (@transient lazy) and shared across rows. */
  case class MultiPhrasePos(child: Expression, phrases: Seq[String])
      extends UnaryExpression with CodegenFallback {
    require(phrases.nonEmpty && phrases.forall(_.trim.nonEmpty),
      "phrases must be non-empty")
    require(phrases.distinct.size == phrases.size, "phrases must be distinct")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("pid", LongType, nullable = false),
      StructField("pos", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_phrase_pos"

    // goto: per-node char→node map; fail: BFS failure links; outs:
    // pattern ids whose match ends at the node (fail-closure merged);
    // plen: padded pattern lengths (for end→start position conversion)
    @transient private lazy val automaton: (Array[java.util.HashMap[Character, Integer]],
        Array[Int], Array[Array[Int]], Array[Int]) = {
      val pats = phrases.map(p => " " + p + " ")
      val goto = scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
      val outs = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[Int])
      pats.zipWithIndex.foreach { case (p, pi) =>
        var s = 0
        p.foreach { c =>
          var nx = goto(s).get(c)
          if (nx == null) {
            goto += new java.util.HashMap[Character, Integer]()
            outs += scala.collection.mutable.ArrayBuffer.empty[Int]
            nx = goto.size - 1
            goto(s).put(c, nx)
          }
          s = nx
        }
        outs(s) += pi
      }
      val fail = Array.fill(goto.size)(0)
      val bfs = scala.collection.mutable.Queue.empty[Int]
      goto(0).forEach((_, v) => { fail(v) = 0; bfs.enqueue(v) })
      while (bfs.nonEmpty) {
        val u = bfs.dequeue()
        goto(u).forEach((c, v) => {
          var f = fail(u)
          while (f != 0 && !goto(f).containsKey(c)) f = fail(f)
          val t = goto(f).get(c)
          fail(v) = if (t != null && t != v) t.intValue() else 0
          outs(v) ++= outs(fail(v)) // fail target is shallower: already final
          bfs.enqueue(v)
        })
      }
      (goto.toArray, fail, outs.map(_.toArray).toArray, pats.map(_.length).toArray)
    }

    override def nullSafeEval(input: Any): Any = {
      val (goto, fail, outs, plen) = automaton
      val text = " " + input.toString + " "
      val first = new Array[Long](phrases.size)
      var found = 0
      var s = 0
      var i = 0
      while (i < text.length && found < first.length) {
        val c = Character.valueOf(text.charAt(i))
        while (s != 0 && !goto(s).containsKey(c)) s = fail(s)
        val t = goto(s).get(c)
        s = if (t != null) t.intValue() else 0
        val os = outs(s)
        var j = 0
        while (j < os.length) {
          val pid = os(j)
          if (first(pid) == 0L) { first(pid) = (i + 2 - plen(pid)).toLong; found += 1 }
          j += 1
        }
        i += 1
      }
      val hits = new scala.collection.mutable.ArrayBuffer[Any](found)
      var pid = 0
      while (pid < first.length) {
        if (first(pid) != 0L)
          hits += org.apache.spark.sql.catalyst.InternalRow((pid + 1).toLong, first(pid))
        pid += 1
      }
      new GenericArrayData(hits.toArray)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Register the expressions as SQL temp functions in a session.
    * createOrReplaceTempFunction is idempotent, so no session-identity
    * guard is needed (an identityHashCode-keyed cache could collide after
    * GC and silently skip a fresh session). Ops call Column-side via
    * functions.call_function. */
  def register(spark: SparkSession): Unit = {
    GraftRules.install(spark)
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash",
      es => MinHashSig(es.head, es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash60",
      es => SimHash60(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_word_ngrams",
      es => WordNGrams(es.head, es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_bytehash",
      es => BytePolyHash(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_poly_hash",
      es => PolyHash(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_contains",
      es => BloomContains(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_jaro_winkler",
      es => JaroWinklerSim(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_pq_tabs", pqDistTable, "built-in")
    reg.createOrReplaceTempFunction("graft_pq_codes", pqEncode, "built-in")
    reg.createOrReplaceTempFunction("graft_pq_adc",
      es => AdcDistance(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_word_chunks",
      es => WordChunks(es.head, es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_word_windows",
      es => WordWindows(es.head, es(1).eval().asInstanceOf[Int],
        es(2).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_winnow",
      es => GramWinnow(es.head, es(1).eval().asInstanceOf[Int],
        es(2).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_cdc_chunks",
      es => CdcChunks(es.head, es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_ewma_fold",
      es => EwmaFold(es.head, es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_word_counts",
      es => WordCounts(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_vocab_tokenize",
      es => VocabTokenize(es.head, {
        val a = es(1).eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      }), "built-in")
    reg.createOrReplaceTempFunction("graft_unigram_viterbi",
      es => UnigramViterbi(es.head, {
        val a = es(1).eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      }, {
        val a = es(2).eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until a.numElements()).map(a.getLong)
      }, es(3).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_word_pairs",
      es => WordPairs(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_long_pairs",
      es => LongPairs(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_throttle_fold",
      es => ThrottleFold(es.head, es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_phrase_pos",
      es => MultiPhrasePos(es.head, {
        val a = es(1).eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      }), "built-in")
    // decimal fast-sum plumbing (BarOps.moneySumFast): Catalyst's own
    // UnscaledValue/MakeDecimal pair — the DecimalAggregates rewrite,
    // exposed so it can be applied beyond the precision the rule
    // auto-fires at (with the overflow precondition documented there)
    reg.createOrReplaceTempFunction("graft_unscaled",
      es => UnscaledMicros(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_make_decimal_38_6",
      es => org.apache.spark.sql.catalyst.expressions.MakeDecimal(es.head, 38, 6),
      "built-in")
  }
}

/** Session-extension entry point: makes the graft functions available in
  * any session built with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), including plain `spark.sql`
  * users — the deployment-grade alternative to per-session registration. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import CatalystExpressions._

  def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => GraftRules.LevenshteinPrefilter)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroup.TopKStrategy)
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[CatalystExpressions.type].getName, name, usage,
        "", "", "", "", "", "4.0.0", "", "built-in")
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "_FUNC_(a, b) - left-fold dot product of two double arrays"),
      es => DotProduct(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "_FUNC_(shingles, k) - k-permutation MinHash signature"),
      es => MinHashSig(es.head, es(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "_FUNC_(tokens) - 64-bit SimHash"),
      es => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", "_FUNC_(tokens) - 60-bit SQL-replayable SimHash"),
      es => SimHash60(es.head)))
    e.injectFunction((FunctionIdentifier("graft_word_ngrams"),
      info("graft_word_ngrams", "_FUNC_(text, n) - distinct word n-gram shingles"),
      es => WordNGrams(es.head, es(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_bytehash"),
      info("graft_bytehash", "_FUNC_(bin) - 31-base polynomial hash over bytes mod 1e9+7"),
      es => BytePolyHash(es.head)))
    e.injectFunction((FunctionIdentifier("graft_poly_hash"),
      info("graft_poly_hash", "_FUNC_(text) - 31-base polynomial hash over UTF-16 code units mod 1e9+7"),
      es => PolyHash(es.head)))
    e.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains", "_FUNC_(filterBytes, key) - Bloom-filter membership probe (literal filter, long key)"),
      es => BloomContains(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler", "_FUNC_(a, b) - Jaro-Winkler similarity (textbook parameters, DuckDB-replayable)"),
      es => JaroWinklerSim(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("graft_pq_tabs"),
      info("graft_pq_tabs", "_FUNC_(v, nrm, flatCents, m, ks) - fused per-subspace PQ distance tables"),
      pqDistTable))
    e.injectFunction((FunctionIdentifier("graft_pq_codes"),
      info("graft_pq_codes", "_FUNC_(v, nrm, flatCents, m, ks) - fused PQ codes (argmin per subspace)"),
      pqEncode))
    e.injectFunction((FunctionIdentifier("graft_pq_adc"),
      info("graft_pq_adc", "_FUNC_(codes, tabs) - ADC distance: left-fold sum of tabs[j][codes[j]]"),
      es => AdcDistance(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("graft_word_chunks"),
      info("graft_word_chunks", "_FUNC_(text, width) - non-overlapping width-word chunk tiling"),
      es => WordChunks(es.head, es(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_word_windows"),
      info("graft_word_windows", "_FUNC_(text, width, stride) - overlapping word windows (context segmentation)"),
      es => WordWindows(es.head, es(1).eval().asInstanceOf[Int],
        es(2).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_cdc_chunks"),
      info("graft_cdc_chunks", "_FUNC_(text, divisor) - content-defined word chunking (boundary where polyHash(word) mod divisor = 0)"),
      es => CdcChunks(es.head, es(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_word_counts"),
      info("graft_word_counts", "_FUNC_(tokens) - per-row term-frequency pairs (term, tf), term-sorted, empties skipped"),
      es => WordCounts(es.head)))
    e.injectFunction((FunctionIdentifier("graft_vocab_tokenize"),
      info("graft_vocab_tokenize", "_FUNC_(text, vocab) - greedy longest-match subword tokenize against the vocab array; struct(n_tokens, n_unk, id_wsum)"),
      es => VocabTokenize(es.head, {
        val a = es(1).eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      })))
    e.injectFunction((FunctionIdentifier("graft_unigram_viterbi"),
      info("graft_unigram_viterbi", "_FUNC_(word, pieces, scores, maxLen) - integer-score unigram-LM Viterbi segmentation (best decomposition into vocab pieces)"),
      es => UnigramViterbi(es.head, {
        val a = es(1).eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      }, {
        val a = es(2).eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until a.numElements()).map(a.getLong)
      }, es(3).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_word_pairs"),
      info("graft_word_pairs", "_FUNC_(tokens) - ordered pairs (ta < tb) of the distinct non-empty tokens"),
      es => WordPairs(es.head)))
    e.injectFunction((FunctionIdentifier("graft_long_pairs"),
      info("graft_long_pairs", "_FUNC_(items) - ordered pairs (a < b) of the distinct longs"),
      es => LongPairs(es.head)))
    e.injectFunction((FunctionIdentifier("graft_ewma_fold"),
      info("graft_ewma_fold", "_FUNC_(rows, alphaNum, init) - O(n) EWMA fold over time-sorted rows (init = chained segment state or NULL)"),
      es => EwmaFold(es.head, es(1), es(2))))
    e.injectFunction((FunctionIdentifier("graft_unscaled"),
      info("graft_unscaled", "_FUNC_(dec) - unscaled long of a decimal(p,6) (fast-sum plumbing)"),
      es => UnscaledMicros(es.head)))
    e.injectFunction((FunctionIdentifier("graft_make_decimal_38_6"),
      info("graft_make_decimal_38_6", "_FUNC_(long) - reattach decimal(38,6) scale to an unscaled long"),
      es => org.apache.spark.sql.catalyst.expressions.MakeDecimal(es.head, 38, 6)))
  }
}
