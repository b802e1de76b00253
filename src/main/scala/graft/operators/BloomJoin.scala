package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction (SURVEY scale notes; no reference
  * precedent — the reference's only join is a distributed-cache broadcast).
  *
  * The classic 100 TB join problem: probe side (fact) is huge, build side is
  * selective but too large to broadcast as rows. Shuffling the whole probe
  * side to discover that 95% of it has no partner wastes the bulk of the
  * job's I/O. Fix: aggregate the build side's join keys into a compact Bloom
  * filter (a distributed aggregate — only the ~MB bit array reaches the
  * driver), broadcast the BITS, and pre-filter the probe side BEFORE its
  * shuffle. False positives pass the pre-filter and are discarded by the
  * exact join that follows, so the result is identical to the plain join —
  * only the shuffle volume changes (by the join selectivity, e.g. 20× for a
  * 5%-selective build side).
  *
  * This is the explicit form of what AQE's runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects when
  * statistics justify it; the explicit operator documents the plan shape and
  * works when stats are absent or the build side is an arbitrary subquery.
  */
object BloomJoin {

  /** Inner equi-join of `probe` with `build`, probe side pre-filtered by a
    * Bloom filter over `build`'s keys.
    *
    * `expectedItems` sizes the filter (overestimating costs bits, not
    * correctness: ~1.2 MB per million items at fpp=0.01). At unknown build
    * cardinality, pass an upper bound or `build.count()` first.
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    // Both key sides must be integral: the filter is BUILT by putLong and
    // PROBED by mightContainLong — a string build key would insert UTF-8
    // bytes into a different hash space and silently drop every true match.
    // Fail at plan time with a clear message, not at runtime inside a task.
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    val probeType = probe.schema(probeKey).dataType
    require(integral.contains(probeType),
      s"bloomPrunedJoin needs an integral probe key, got $probeKey: $probeType")
    val buildType = build.schema(buildKey).dataType
    require(integral.contains(buildType),
      s"bloomPrunedJoin needs an integral build key, got $buildKey: $buildType")
    // Distributed build: BloomFilterAggregate partials merge on the driver;
    // rows never leave the executors. An EMPTY build side NPEs inside
    // Spark's stat.bloomFilter (null aggregate buffer) — an empty build
    // means an empty join, so short-circuit to the (schema-preserving)
    // empty plan instead of scanning the probe side at all.
    val bloomOpt =
      try Some(build.stat.bloomFilter(buildKey, expectedItems, fpp))
      catch {
        case npe: NullPointerException =>
          // Confirm the NPE really is the no-insertable-keys case before
          // treating it as one — any OTHER driver-side NPE must surface, not
          // become a silently empty join. The probe must ignore null keys: a
          // NON-empty build side whose keys are ALL null hits the same
          // null-buffer NPE (nulls never reach putLong), and null never
          // matches an equi-join — so both the empty and the all-null build
          // side correctly short-circuit to the empty join. (The probe only
          // runs on this already-failed path, never in the common case.)
          if (build.select(buildKey).where(col(buildKey).isNotNull).isEmpty) None
          else throw npe
      }
    bloomOpt match {
      case None =>
        probe.join(build, col(probeKey) === col(buildKey)).limit(0)
      case Some(bloom) =>
        val bits = probe.sparkSession.sparkContext.broadcast(bloom)
        // Nullable key: null never joins in an equi-join, so the pre-filter
        // may drop it outright (boxed Long keeps the UDF null-safe under
        // ANSI mode).
        val mightContain = udf((k: java.lang.Long) =>
          k != null && bits.value.mightContainLong(k))
        probe.filter(mightContain(col(probeKey)))
          .join(build, col(probeKey) === col(buildKey))
    }
  }
}
