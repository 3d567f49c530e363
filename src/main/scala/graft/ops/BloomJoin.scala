package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered joins — the scan-side membership pushdown a
  * 100-TB pipeline runs when one join side is a compact key set (a
  * benchmark denylist, an admitted-id whitelist, a tombstone list) and
  * the other is the corpus: build ONE fixed-size filter from the key
  * side, probe it inside the corpus scan (a codegen'd Project — see
  * functions/CatalystExpressions.BloomContains), and let only the
  * maybe-positive sliver pay the exact equi-join. Sure-negatives never
  * reach an Exchange, which is the entire win: the shuffle is sized by
  * |maybe-positives| ≈ fpp·|corpus| + |matches|, not |corpus|.
  *
  * Correctness contract: the Bloom probe admits false POSITIVES only, so
  * both entry points close with the exact join on the probed subset —
  * results are bit-identical to the plain semi/anti join (spec-asserted);
  * the filter only changes WHERE the work happens.
  *
  * The filter is built distributed (one pass over the key side,
  * mergeable partials) and shipped as a plan literal, the same
  * codebook-as-literal pattern as the PQ family. Size it with
  * `expectedItems ≈ |keys|`: 1M keys at fpp 0.01 is ~1.2 MB — broadcast
  * class, independent of corpus size. */
object BloomJoin {

  private def filterBytes(keys: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The probe hashes LONG keys (BloomContains's contract); a string or
    * decimal key would be inserted as its own byte encoding by
    * stat.bloomFilter but probed after cast('long') — false NEGATIVES,
    * which in antiJoin silently RETAIN true members. Fail fast instead:
    * only integral types share the long hash on both sides. */
  private def requireIntegralKeys(big: DataFrame, keys: DataFrame,
      bigKey: String, keyCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val ok = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    val bt = big.schema(bigKey).dataType
    val kt = keys.schema(keyCol).dataType
    require(ok(bt) && ok(kt),
      s"BloomJoin requires integral key columns (byte/short/int/long); " +
        s"got $bigKey: ${bt.catalogString}, $keyCol: ${kt.catalogString}")
  }

  /** Exact semi join accelerated by a Bloom pre-filter: rows of `big`
    * whose `bigKey` appears in `keys.keyCol`. */
  def semiJoin(big: DataFrame, keys: DataFrame, bigKey: String,
      keyCol: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    requireIntegralKeys(big, keys, bigKey, keyCol)
    val bytes = filterBytes(keys, keyCol, expectedItems, fpp)
    // NULL keys: the probe null-evals to NULL, the filter drops the row —
    // exactly what left_semi does with a NULL join key, so no coalesce is
    // needed on this side
    big.filter(call_function("graft_bloom_contains",
        lit(bytes), col(bigKey).cast("long")))
      .join(keys.select(col(keyCol).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }

  /** Exact anti join accelerated by a Bloom pre-filter: rows of `big`
    * whose `bigKey` does NOT appear in `keys.keyCol`. Sure-negative rows
    * (filter says no — guaranteed correct) bypass the join entirely;
    * only maybe-positives are re-checked exactly. */
  def antiJoin(big: DataFrame, keys: DataFrame, bigKey: String,
      keyCol: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    requireIntegralKeys(big, keys, bigKey, keyCol)
    val bytes = filterBytes(keys, keyCol, expectedItems, fpp)
    val maybe = call_function("graft_bloom_contains",
      lit(bytes), col(bigKey).cast("long"))
    // NULL keys probe to NULL, which both !maybe and maybe would drop —
    // but a plain left_anti RETAINS null-key left rows (NULL matches
    // nothing). Route them into the sure-negative bypass branch.
    big.filter(coalesce(!maybe, lit(true))).unionAll(
      big.filter(coalesce(maybe, lit(false)))
        .join(keys.select(col(keyCol).as(bigKey)).distinct(), Seq(bigKey), "left_anti"))
  }
}
