package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation for shuffle joins.
  *
  * AQE's runtime skew-join split (`spark.sql.adaptive.skewJoin.enabled`,
  * on in our sessions) handles moderate skew by splitting oversized
  * shuffle blocks. Salting is the explicit fallback for pathological keys
  * — a single key whose rows exceed one executor's memory — and for
  * non-AQE paths (streaming joins).
  */
object Skew {

  /** Equi-join with the left (large, skewed) side spread over `salts`
    * sub-keys and the right side replicated `salts`×. The result is
    * row-identical to `left.join(right, Seq(key), joinType)` — salting
    * only changes the partitioning, shrinking the largest shuffle
    * partition by ~`salts`.
    *
    * `joinType` may be `inner`, `left` / `left_outer`, `left_semi`, or
    * `left_anti`: every left row carries exactly one salt and the right
    * side holds all salts of each key, so per-left-row match semantics
    * (including "no match" for outer/anti) are preserved exactly.
    * Right-outer / full-outer are rejected — an unmatched RIGHT key would
    * surface once per salt replica, and salting the right side instead is
    * the symmetric call with left/right swapped.
    *
    * `discriminator` must be a left-side expression that varies within a
    * key group (a line number, an event id …); its hash assigns each row
    * a deterministic salt, so runs are reproducible (no `rand()`).
    *
    * Cost model: right side shuffles `salts`× its size — use for
    * large⋈medium joins; for large⋈small prefer `broadcast(right)` which
    * removes the shuffle entirely.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      discriminator: Column, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must be > 1 (1 would be a plain join)")
    val leftPreserving = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(leftPreserving(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports left-preserving join types only, got '$joinType' " +
        "(for right-skew, swap the sides)")
    val sl = left.withColumn("__salt",
      pmod(xxhash64(discriminator), lit(salts)).cast("int"))
    val sr = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    sl.join(sr, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
