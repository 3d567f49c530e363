package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators
  * (dedup / fingerprinting / quality scoring). Everything here is built
  * from Catalyst expressions (no UDFs): at 100 TB these run inside the
  * scan-project pipeline with no serialization boundary.
  *
  * Where an operator must be replayed exactly by the DuckDB oracle, the
  * hash is `polyHash` (a plain polynomial rolling hash — reproducible in
  * any SQL engine) rather than xxhash64; xxhash64 is used where only
  * Spark-side determinism matters (MinHash/SimHash signatures).
  */
object TextFunctions {

  val PolyMod: Long = 1000000007L

  /** Words of a single-space-separated text. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles, e.g. n=3: "a b c d" -> ["a b c","b c d"].
    * Documents shorter than n words produce no shingles. Compiled
    * (CatalystExpressions.WordNGrams); callers must have registered the
    * graft functions (any graft.ops entry point does). */
  def wordShingles(text: Column, n: Int): Column =
    call_function("graft_word_ngrams", text, lit(n))

  /** Distinct character n-gram shingles. */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) >= n,
        transform(sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n))))
        .otherwise(array().cast("array<string>")))

  /** Polynomial rolling hash over the characters of a string:
    * fold(acc = 0; acc = (acc*31 + char) mod 1e9+7), compiled
    * (CatalystExpressions.PolyHash — callers must have registered the
    * graft functions; Queries.table and every graft.ops entry point do).
    * ONE fold definition shared with the driver-side twin
    * (TextAnalysis.polyHashLocal) and CdcChunks' boundary rule, so
    * index bucketing and serve-time pruning agree on ANY input; the
    * DuckDB oracles' ascii()-per-split-char list_reduce replays it
    * exactly on all BMP text (a UTF-16 unit is the code point there —
    * the earlier ascii()-based Column fold diverged from both on every
    * non-ASCII char, silently mis-bucketing non-ASCII index terms). */
  def polyHash(text: Column): Column =
    call_function("graft_poly_hash", text)

}
