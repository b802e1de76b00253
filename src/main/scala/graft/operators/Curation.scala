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
