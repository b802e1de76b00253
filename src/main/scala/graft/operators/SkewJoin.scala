package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle equi-joins (SURVEY scale notes; no reference
  * precedent — the reference's only join is broadcast).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting is
  * the deterministic-plan fallback when a handful of hot keys dominate (the
  * classic 100 TB failure mode: one key = 10% of the fact table lands on one
  * task). Mechanics: the skewed (big) side gets a uniform salt in
  * [0, nSalts); the other side is replicated nSalts×; the join key becomes
  * (key, salt), fanning each hot key across nSalts tasks. Join RESULTS are
  * salt-invariant — only the partitioning changes.
  *
  * Replication multiplies the small side nSalts× — use for big×medium
  * joins where the medium side is too large to broadcast but cheap to
  * replicate a few times.
  */
object SkewJoin {

  /** Inner/left equi-join of `big` (skewed) with `other` on `key`. */
  def saltedEquiJoin(big: DataFrame, other: DataFrame, key: String,
      nSalts: Int = 8, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    // Salting is only result-invariant when the REPLICATED side's unmatched
    // rows can't surface: right/full/semi/anti would emit them nSalts× (or
    // dedup wrongly). Fail loudly rather than silently inflating results.
    require(Set("inner", "left", "leftouter")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedEquiJoin supports inner/left joins only, got '$joinType'")
    // Salt from a stable row fingerprint rather than rand(): deterministic
    // plans re-execute identically (task retries, AQE re-optimization).
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(nSalts)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    salted
      .join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
