package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed round-9 curation pipeline — the embedding-space sibling of
  * `Dedup.dedupFirstPipeline`'s minhash chain: model-based quality gate
  * (`TextAnalysis.lrQuality`) → SemDeDup semantic dedup over the survivors
  * (`Similarity.semanticDedup`) → temperature flattening of the deduped
  * corpus (`Sampling.temperatureSample`), reported as a per-stratum funnel
  * `(lang, n_gated, n_semantic, n_final)`.
  *
  * Every stage is the declared operator — this module only wires them, so
  * the scale story is the stages' own: per-row gate (no shuffle), one
  * cell-keyed self-join bounded by the rep prelude, one metadata-scale
  * count + broadcast-threshold filter. The funnel output is three
  * map-side-combined aggregates left-joined on the stratum (stage k's
  * strata are a subset of stage k−1's, so left joins + coalesce(0) lose
  * nothing).
  */
object Curation {

  /** Novelty-weighted curation of an ARRIVING batch against a standing
    * corpus — the dedup-aware sampling composition `windowNovelty` exists
    * for (the value signal of the r11 exact-substring family, now
    * consumed): LR quality gate → window-novelty floor vs the standing
    * corpus (0 = verbatim corpus content drops; wrapper-text spam around
    * copied passages scores mid-range and drops below the floor; genuinely
    * new text scores ~1 and survives) → temperature rebalance of the
    * survivors' language mixture. Returns per-lang funnel counts
    * `(lang, n_gated, n_novel, n_final)`.
    *
    * Stage order is the cost order: the per-row gate runs first so the
    * window projection (the expensive stage — L bytes of hashing per doc
    * char) only pays for gate survivors; the novelty probe is
    * `windowNovelty`'s single batch-side pass against the corpus's
    * DISTINCT window keys (no fan-out join); the rebalance is a
    * metadata-scale threshold broadcast + pure-row-property hash filter.
    * Nothing here re-pairs or re-scans the standing corpus beyond the one
    * distinct-keys stream. */
  def noveltyFunnel(standing: DataFrame, batch: DataFrame,
      noveltyFloor: Double = 0.5, L: Int = 40): DataFrame =
    noveltyFunnelFrom(batch, noveltyFloor,
      g => Dedup.windowNovelty(standing, g, L))

  /** [[noveltyFunnel]] probing a prebuilt exact-window INDEX
    * ([[graft.operators.Dedup.buildExactWindowIndex]]) instead of
    * recomputing the standing corpus's window keys — the per-arrival
    * shape [[graft.streaming.Streams]]'s novelty loop runs: gate →
    * [[graft.operators.Dedup.windowNoveltyIndexed]] (index streamed,
    * own-micro-batch partition excluded for replay exactness) →
    * temperature rebalance. `L` comes from the index manifest, so a
    * probe can never hash with a different window length than the
    * index. */
  def noveltyFunnelIndexed(indexDir: String, batch: DataFrame,
      noveltyFloor: Double = 0.5,
      excludeIngestBatch: Option[Long] = None): DataFrame =
    noveltyFunnelFrom(batch, noveltyFloor,
      g => Dedup.windowNoveltyIndexed(batch.sparkSession, indexDir, g,
        excludeIngestBatch))

  /** The shared funnel body: LR gate → novelty floor over the given
    * scorer → temperature rebalance → per-lang counts. One code path for
    * the batch and indexed/streaming forms, so they cannot drift. */
  private def noveltyFunnelFrom(batch: DataFrame, noveltyFloor: Double,
      score: DataFrame => DataFrame): DataFrame = {
    val gate = TextAnalysis.lrQuality(batch)
      .where(col("pass") === 1)
      .join(batch.select(col("doc_id"), col("lang"), col("text")), "doc_id")
      .select(col("doc_id"), col("lang"), col("text"))
    val novel = gate.join(
        score(gate.select(col("doc_id"), col("text")))
          .where(col("novelty") >= noveltyFloor)
          .select(col("doc_id")),
        "doc_id")
      .select(col("doc_id"), col("lang"))
    val fin = Sampling.temperatureSample(novel, col("lang"), col("doc_id"))
    def countBy(df: DataFrame, as: String): DataFrame =
      df.groupBy(col("lang")).agg(count(lit(1)).as(as))
    countBy(gate, "n_gated")
      .join(countBy(novel, "n_novel"), Seq("lang"), "left")
      .join(countBy(fin, "n_final"), Seq("lang"), "left")
      .select(col("lang"), col("n_gated"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(col("n_final"), lit(0L)).as("n_final"))
  }

  /** Per-stratum funnel over `docs(doc_id, lang, text, …)` and
    * `embs(vec_id, embedding)` with `doc_id == vec_id` row identity. */
  def funnel(docs: DataFrame, embs: DataFrame,
      threshold: Double = 0.9, nCells: Int = 16): DataFrame = {
    val gate = TextAnalysis.lrQuality(docs)
      .where(col("pass") === 1)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"))
    val gatedVecs = gate
      .join(embs.select(col("vec_id"), col("embedding")),
        gate("doc_id") === col("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val semKept = Similarity.semanticDedup(gatedVecs, threshold, nCells)
      .where(col("kept") === 1)
      .join(gate, col("vec_id") === gate("doc_id"))
      .select(col("vec_id"), col("lang"))
    val fin = Sampling.temperatureSample(semKept, col("lang"), col("vec_id"))
    def countBy(df: DataFrame, as: String): DataFrame =
      df.groupBy(col("lang")).agg(count(lit(1)).as(as))
    countBy(gate, "n_gated")
      .join(countBy(semKept, "n_semantic"), Seq("lang"), "left")
      .join(countBy(fin, "n_final"), Seq("lang"), "left")
      .select(col("lang"), col("n_gated"),
        coalesce(col("n_semantic"), lit(0L)).as("n_semantic"),
        coalesce(col("n_final"), lit(0L)).as("n_final"))
  }
}
