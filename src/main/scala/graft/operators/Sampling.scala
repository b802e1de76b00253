package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the way large training-data
  * pipelines actually subsample (LLM-pipeline surface; no reference
  * precedent). `df.sample()` is seed×partitioning dependent; hash-mod
  * sampling is a pure row property: reproducible across engines, runs,
  * cluster sizes and repartitions, and stable under incremental re-runs
  * (a row's keep/drop never changes when other rows arrive).
  *
  * Cross-engine determinism: the bucket is the first 8 hex digits of
  * `md5(key)` mod `buckets` — DuckDB reproduces it verbatim
  * (`('0x' || substr(md5(k),1,8))::BIGINT % buckets`), so sampling
  * queries hash-gate like any other.
  *
  * Scale: one codegen'd projection + filter, pushes nothing to the driver,
  * no shuffle; composes with partition pruning (the filter sits above the
  * scan).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row key. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Keep rows whose bucket < `pct` (of `buckets`, i.e. pct% by default). */
  def hashSample(df: DataFrame, key: Column, pct: Int, buckets: Int = 100): DataFrame = {
    require(pct >= 0 && pct <= buckets, s"pct $pct out of [0, $buckets]")
    df.where(hashBucket(key, buckets) < pct)
  }

  /** Per-stratum rates (e.g. downsample dominant languages, keep the long
    * tail whole). Strata absent from `rates` are DROPPED — an explicit
    * allowlist, the usual pipeline contract. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Int], buckets: Int = 100): DataFrame = {
    require(rates.values.forall(p => p >= 0 && p <= buckets),
      s"rates out of [0, $buckets]: $rates")
    val rateCol = rates.foldLeft(lit(-1)) { case (acc, (s, p)) =>
      when(stratum === s, lit(p)).otherwise(acc)
    }
    df.where(hashBucket(key, buckets) < rateCol)
  }
}
