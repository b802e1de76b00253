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

  /** Stable uniform draw in [0, 1) from the row key: the first 8 hex
    * digits of md5 over 2³². Exact in double (a 32-bit integer divided by
    * a power of two), so DuckDB reproduces it bit-identically. */
  def hashUnit(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") /
      lit(4294967296.0)

  /** Weighted deterministic retention: keep a row iff its stable uniform
    * draw is below `weight` (a per-row [0,1] column — e.g. a quality
    * score, the FineWeb-Edu pattern: retention probability proportional
    * to quality instead of a hard gate). Same guarantees as
    * [[hashSample]] — pure row property, reproducible across engines and
    * cluster sizes, a row's fate never changes when other rows arrive —
    * but the rate is per-ROW, not per-stratum. Compare against an
    * already-ROUNDED weight so both engines draw the same verdict. */
  def weightedSample(df: DataFrame, key: Column, weight: Column): DataFrame =
    df.where(hashUnit(key) < weight)

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

  /** Target-mixture sampling: downsample strata so the OUTPUT hits the given
    * proportions (`targets` sum to ≤ 1; strata absent from it drop) — the
    * domain-rebalancing step of training-corpus assembly, where the mixture
    * is specified a priori and the per-stratum rates must be DERIVED from
    * the data. The achievable corpus size is `N = min_s floor(n_s / p_s)`
    * (the binding stratum is kept whole); every stratum then keeps
    * `floor(p_s · N · buckets / n_s)` of its `buckets` hash slots.
    *
    * Stays fully declarative: one map-side-combined count aggregate over the
    * stratum column (metadata-scale result), a broadcast-joined threshold
    * per stratum, and the same pure-row-property hash filter as
    * [[hashSample]] — no driver collect, one scan of the data plus one
    * count-only scan, reproducible under repartitioning and incremental
    * re-runs of the SAME corpus snapshot (rates are data-dependent, so a
    * grown corpus legitimately re-derives them).
    *
    * Cross-engine determinism: thresholds are `floor()` of the identical
    * left-to-right double expression DuckDB evaluates, compared against the
    * integer hash bucket — no epsilon boundary.
    */
  /** Mixture sampling on TOKEN budgets: training-mixture weights (the
    * DoReMi / data-recipe form) act on token mass, not document counts —
    * a lang of long documents needs fewer docs for the same share of the
    * training budget, and a doc-count mixture silently misallocates
    * 2–4× whenever per-stratum lengths differ. Given weights `w_s` and a
    * total token `budget`: per-stratum token mass `T_s` (one aggregate,
    * map-side combined), realized budget `B = min(budget, min_s ⌊T_s /
    * w_s⌋)` so every weight stays achievable (the [[mixtureSample]]
    * scale-down rule in token space), then each stratum keeps docs
    * through the deterministic hash gate at rate `B·w_s / T_s` — token
    * mass ≈ `B·w_s` in expectation (the doc is the sampling unit; the
    * ~rate contract every hash sampler here has). `tok` must be a pure
    * row property (e.g. [[graft.operators.Bpe.tokenCount]], the same
    * budget basis the packing manifests use) — the gate stays one
    * codegen'd filter over a broadcast threshold row per stratum; the
    * only shuffle is the stats aggregate. */
  def tokenMixtureSample(df: DataFrame, stratum: Column, key: Column,
      tok: Column, weights: Map[String, Double], budget: Long,
      buckets: Int = 10000): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(p => p > 0 && p <= 1),
      s"weights must be in (0, 1]: $weights")
    require(weights.values.sum <= 1.0 + 1e-9,
      s"weights must sum to <= 1: $weights")
    require(budget > 0, s"budget must be positive: $budget")
    val cnt = df.select(stratum.as("_strat"), tok.as("_tok"))
      .groupBy(col("_strat")).agg(sum(col("_tok")).as("_t"))
    // The weight LIST is the driving table ([[keyedMixture]]): a typo'd
    // key raises by name, even when ZERO keys match — the pre-r15
    // data-side guard rode an empty relation then and never fired. The
    // raise_error is lazy, riding the rows; the operator stays
    // collect-free.
    val withW = keyedMixture(df, cnt, weights, "_t",
      "tokenMixtureSample", "weight", "budget share")
      .withColumnRenamed("_p", "_w")
    val achievable = withW
      .agg(least(lit(budget),
        min(floor(col("_t") / col("_w")).cast("long"))).as("_bach"))
    val thresholds = withW.crossJoin(broadcast(achievable))
      .select(col("_strat"),
        floor(col("_w") * col("_bach") * lit(buckets.toDouble) / col("_t"))
          .cast("long").as("_thr"))
    df.join(broadcast(thresholds), stratum <=> col("_strat"), "inner")
      .where(hashBucket(key, buckets) < col("_thr"))
      .drop("_strat", "_thr")
  }

  /** The literal-keys guard shared by every declared-mixture sampler
    * (r15, generalizing the tokenMixtureSample fix): the declared
    * key→value map becomes a literal-values relation LEFT-joined to the
    * data's per-stratum masses, so a key naming no stratum surfaces as a
    * null mass and raises per-row, naming the key — even when ZERO keys
    * match (a data-side-driven guard rides an empty relation then and
    * never fires). Returns `(_strat, _p, <massCol>)`. */
  private def keyedMixture(df: DataFrame, cnt: DataFrame,
      keys: Map[String, Double], massCol: String,
      op: String, noun: String, share: String): DataFrame = {
    val kdf = {
      import df.sparkSession.implicits._
      keys.toSeq.toDF("_strat", "_p")
    }
    kdf.join(cnt, Seq("_strat"), "left")
      .select(col("_strat"), col("_p"),
        when(col(massCol).isNull,
          raise_error(concat(
            lit(s"$op: $noun key "), col("_strat"),
            lit(s" matched no stratum in the data — check the $noun names " +
              s"(an unmatched key's $share would silently vanish)"))))
        .otherwise(col(massCol)).as(massCol))
  }

  def mixtureSample(df: DataFrame, stratum: Column, key: Column,
      targets: Map[String, Double], buckets: Int = 10000): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(p => p > 0 && p <= 1),
      s"target proportions must be in (0, 1]: $targets")
    require(targets.values.sum <= 1.0 + 1e-9,
      s"target proportions must sum to <= 1: $targets")
    val cnt = df.select(stratum.as("_strat"))
      .groupBy(col("_strat")).agg(count(lit(1)).as("_n"))
    // target keys drive (the tokenMixtureSample r15 discipline): a typo'd
    // key raises by name instead of silently vanishing its share
    val withP = keyedMixture(df, cnt, targets, "_n",
      "mixtureSample", "target", "share")
    val achievable = withP
      .agg(min(floor(col("_n") / col("_p")).cast("long")).as("_nach"))
    val thresholds = withP.crossJoin(broadcast(achievable))
      .select(col("_strat"),
        floor(col("_p") * col("_nach") * lit(buckets.toDouble) / col("_n"))
          .cast("long").as("_thr"))
    df.join(broadcast(thresholds), stratum <=> col("_strat"), "inner")
      .where(hashBucket(key, buckets) < col("_thr"))
      .drop("_strat", "_thr")
  }

  /** Temperature-based stratum flattening — the published multilingual
    * sampling rule (exponentiated-count sampling, mBERT/XLM-R style):
    * sampled sizes follow `m_s = n_min^(1−α) · n_s^α`, which keeps the
    * SMALLEST stratum whole and downsamples larger ones toward it; α = 1
    * is a no-op, α → 0 equalizes all strata at `n_min`. No allowlist —
    * temperature applies to every stratum present (that is its point),
    * unlike the declared-mixture samplers above.
    *
    * Same plan shape as [[mixtureSample]]: one metadata-scale count
    * aggregate, broadcast thresholds, pure-row-property hash filter.
    * Cross-engine parity: at the default α = 0.5 the threshold is
    * `floor(buckets·sqrt(double(n_min)·n_s)/n_s)` — the product is taken
    * in DOUBLE (long·long would wrap at 2⁶³ for ~4×10⁹-row strata, the
    * scale this module targets; the double product is correctly rounded,
    * then sqrt/divide/floor are too): every step is identical IEEE in any
    * engine. Other α use `pow`, whose last-ulp behavior is
    * platform-dependent — fine for production, not oracle-gated here. */
  def temperatureSample(df: DataFrame, stratum: Column, key: Column,
      alpha: Double = 0.5, buckets: Int = 10000): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha not in (0, 1]")
    val cnt = df.select(stratum.as("_strat"))
      .groupBy(col("_strat")).agg(count(lit(1)).as("_n"))
    val nmin = cnt.agg(min(col("_n")).as("_nmin"))
    val m =
      if (alpha == 0.5) sqrt(col("_nmin").cast("double") * col("_n"))
      else pow(col("_nmin").cast("double"), lit(1.0 - alpha)) *
        pow(col("_n").cast("double"), lit(alpha))
    val thresholds = cnt.crossJoin(broadcast(nmin))
      .select(col("_strat"),
        floor(lit(buckets.toDouble) * m / col("_n")).cast("long").as("_thr"))
    df.join(broadcast(thresholds), stratum <=> col("_strat"), "inner")
      .where(hashBucket(key, buckets) < col("_thr"))
      .drop("_strat", "_thr")
  }

  /** Mixture resampling WITH upsampling — the repeat-factor form real
    * training mixtures use (under-represented domains repeat for multiple
    * epochs; over-represented ones downsample): the output holds the
    * targeted strata's total `N = Σ_targeted n_s` (strata absent from
    * `targets` drop) but redistributed to the target proportions, so
    * stratum `s` needs `f_s = p_s·N / n_s` copies of each row — `⌊f_s⌋`
    * full epochs plus a fractional epoch containing the rows whose hash
    * bucket clears `floor((f_s − ⌊f_s⌋)·buckets)`. Output rows carry an
    * `epoch` column (0-based) so downstream shuffling/packing can
    * interleave epochs rather than concatenate them.
    *
    * [[mixtureSample]] is the pure-downsampling contract (never duplicates,
    * binding stratum whole); this one trades exact-dedup cleanliness for
    * hitting the mixture at FULL corpus size — the standard trade the
    * published data recipes make.
    *
    * Scale: one metadata-scale count aggregate, broadcast factors, then a
    * codegen'd `sequence`+`explode` per row — output amplification is
    * exactly the declared repeat factors, there is no shuffle at all
    * beyond the count. Determinism: `f_s` is a fixed-order double
    * expression, epoch membership is an integer compare on the same md5
    * buckets as every other sampler. */
  def mixtureResample(df: DataFrame, stratum: Column, key: Column,
      targets: Map[String, Double], buckets: Int = 10000,
      maxEpochs: Int = 100): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(p => p > 0 && p <= 1),
      s"target proportions must be in (0, 1]: $targets")
    require(targets.values.sum <= 1.0 + 1e-9,
      s"target proportions must sum to <= 1: $targets")
    require(maxEpochs > 0, s"maxEpochs must be positive: $maxEpochs")
    val cnt = df.select(stratum.as("_strat"))
      .groupBy(col("_strat")).agg(count(lit(1)).as("_n"))
    // typo'd target keys raise by name (keyedMixture, r15)
    val withP = keyedMixture(df, cnt, targets, "_n",
      "mixtureResample", "target", "share")
    val total = withP.agg(sum(col("_n")).as("_tot"))
    val factors = withP.crossJoin(broadcast(total))
      .select(col("_strat"),
        floor(col("_p") * col("_tot") / col("_n")).cast("long").as("_full"),
        floor((col("_p") * col("_tot") / col("_n")
            - floor(col("_p") * col("_tot") / col("_n"))) * lit(buckets.toDouble))
          .cast("long").as("_thr"))
      // amplification guard: a mistyped target against a tiny stratum
      // would otherwise explode a row into millions of epochs; published
      // recipes repeat data ~O(10) times, so beyond maxEpochs is a spec
      // error, not a mixture — fail fast with the offending stratum named
      .withColumn("_full",
        when(col("_full") > maxEpochs,
          raise_error(concat(lit("mixtureResample: stratum "), col("_strat"),
            lit(s" needs more than $maxEpochs epochs ("), col("_full").cast("string"),
            lit(") — check the target mixture"))))
        .otherwise(col("_full")))
    df.join(broadcast(factors), stratum <=> col("_strat"), "inner")
      .select(df.columns.map(col) :+ col("_full") :+ col("_thr") :+
        explode(sequence(lit(0L), col("_full"))).as("epoch"): _*)
      .where(col("epoch") < col("_full") ||
        hashBucket(key, buckets) < col("_thr"))
      .drop("_strat", "_full", "_thr")
  }

  /** Mixture resampling with upsampling on TOKEN budgets —
    * [[mixtureResample]]'s DoReMi-shaped sibling, the form the published
    * recipes actually repeat by: stratum `s` holds token mass `T_s`; the
    * output redistributes the targeted total `T = Σ_targeted T_s` to the
    * declared proportions, so each doc of `s` appears `f_s = p_s·T / T_s`
    * times — `⌊f_s⌋` full epochs plus a hash-gated fractional epoch
    * (token mass kept ≈ `frac(f_s)·T_s` in expectation; the doc is the
    * repetition unit, exactly as in the doc-count form). A doc-count
    * repeat factor misallocates whenever per-stratum lengths differ — a
    * stratum of long documents gets its factor computed from doc share,
    * not token share, and can over-repeat its token mass several-fold
    * (SamplingSpec pins the asymmetry).
    *
    * Same plan as [[mixtureResample]]: one map-side-combined token-mass
    * aggregate (metadata-scale), broadcast factors, then the codegen'd
    * `sequence`+`explode` — no shuffle beyond the aggregate, output
    * amplification exactly the declared factors, the same `maxEpochs`
    * fail-fast against a mistyped target amplifying a tiny stratum.
    * `tok` must be a pure row property (the [[tokenMixtureSample]]
    * contract). Strata absent from `targets` drop. */
  def tokenMixtureResample(df: DataFrame, stratum: Column, key: Column,
      tok: Column, targets: Map[String, Double], buckets: Int = 10000,
      maxEpochs: Int = 100): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(p => p > 0 && p <= 1),
      s"target proportions must be in (0, 1]: $targets")
    require(targets.values.sum <= 1.0 + 1e-9,
      s"target proportions must sum to <= 1: $targets")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val cnt = df.select(stratum.as("_strat"), tok.as("_tok"))
      .groupBy(col("_strat")).agg(sum(col("_tok")).as("_t"))
    // typo'd target keys raise by name (keyedMixture, r15)
    val withP = keyedMixture(df, cnt, targets, "_t",
      "tokenMixtureResample", "target", "token share")
    val total = withP.agg(sum(col("_t")).as("_tt"))
    val factors = withP.crossJoin(broadcast(total))
      .select(col("_strat"),
        floor(col("_p") * col("_tt") / col("_t")).cast("long").as("_full"),
        floor((col("_p") * col("_tt") / col("_t")
            - floor(col("_p") * col("_tt") / col("_t"))) * lit(buckets.toDouble))
          .cast("long").as("_thr"))
      .withColumn("_full",
        when(col("_full") > maxEpochs,
          raise_error(concat(lit("tokenMixtureResample: stratum "), col("_strat"),
            lit(s" needs more than $maxEpochs epochs ("), col("_full").cast("string"),
            lit(") — check the target mixture"))))
        .otherwise(col("_full")))
    df.join(broadcast(factors), stratum <=> col("_strat"), "inner")
      .select(df.columns.map(col) :+ col("_full") :+ col("_thr") :+
        explode(sequence(lit(0L), col("_full"))).as("epoch"): _*)
      .where(col("epoch") < col("_full") ||
        hashBucket(key, buckets) < col("_thr"))
      .drop("_strat", "_full", "_thr")
  }

  /** Leakage-safe train/val/test split: every member of a near-dup
    * CLUSTER lands in the same fold, so no near-copy of a training
    * document can leak into evaluation — the contamination mode a plain
    * per-document hash split cannot prevent (a doc and its near-copy
    * hash independently and straddle the boundary). The standard remedy
    * in published dedup pipelines: split on the cluster, not the doc.
    *
    * `labels` is a `(doc_id, cluster_id)` near-dup labeling (e.g.
    * [[graft.operators.Dedup.clusterDedupFirst]] output, or a persisted
    * standing labeling); docs absent from it are singletons and split on
    * their own id. `folds` is an ordered list of `(name, upperBucket)`
    * with EXCLUSIVE upper bounds over [0, buckets) — e.g.
    * `Seq(("train", 80), ("val", 90), ("test", 100))` — and the last
    * bound must equal `buckets` so every row is assigned.
    *
    * Scale: one equi-join against the labeling (broadcast when the
    * labeling is small — it is pair-bearing docs only, usually a small
    * fraction of the corpus — else a shuffle join on doc_id), then the
    * same pure-row-property md5 bucket as every sampler here. The fold
    * of a doc never changes when OTHER docs arrive; it changes only if
    * its own cluster merges — which is exactly the property you want
    * (the merged cluster re-lands whole, still leak-free). */
  def clusterSplit(docs: DataFrame, labels: DataFrame,
      folds: Seq[(String, Int)], buckets: Int = 100): DataFrame = {
    require(folds.nonEmpty, "folds must be non-empty")
    require(folds.map(_._2) == folds.map(_._2).sorted,
      s"fold bounds must be ascending: $folds")
    require(folds.last._2 == buckets,
      s"last fold bound ${folds.last._2} must equal buckets=$buckets")
    val keyed = docs.join(labels.select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
      .drop("cluster_id")
    val b = hashBucket(col("split_key"), buckets)
    val foldCol = folds.init.foldRight(lit(folds.last._1): Column) {
      case ((name, hi), acc) => when(b < hi, lit(name)).otherwise(acc)
    }
    keyed.withColumn("fold", foldCol)
  }

  /** Deterministic global training order: assign each row a shard in
    * [0, nShards) and a 1-based position within its shard, both pure
    * functions of the row key and `seed` — the reproducible-shuffle
    * contract a training run needs (same corpus + same seed = identical
    * batch order on any cluster size; a new seed is a fresh permutation;
    * resuming from shard/pos is exact).
    *
    * Scale: the shard is a pure row property (no shuffle); the position
    * is a window partitioned BY SHARD — parallel across shards, one
    * sort per shard. Size `nShards` so a shard fits an executor's sort
    * budget (at 100 TB: tens of thousands of shards), which is the same
    * knob as the training job's file-shard count; there is no global
    * total-order bottleneck anywhere. */
  def shardOrder(df: DataFrame, key: Column, nShards: Int,
      seed: String = "s42"): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    import org.apache.spark.sql.expressions.Window
    val order = md5(concat(lit(seed + ":"), key.cast("string")))
    // the shard is seeded too: a new seed is a fresh permutation across
    // shards, not just within them
    df.withColumn("shard", hashBucket(concat(lit(seed + ":"), key.cast("string")), nShards))
      .withColumn("pos",
        row_number().over(Window.partitionBy(col("shard"))
          .orderBy(order, key)).cast("long"))
  }
}
