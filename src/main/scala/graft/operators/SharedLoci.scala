package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE reference query (R15+R16+R17): count study loci and how many match
  * the reference panel on `chr:pos` with **order-sensitive,
  * case-insensitive** allele equality `"REF/ALT"`
  * (`LASERInputCheckMapper.java:239-251`, `compareToIgnoreCase` at `:245`;
  * duplicate logic `TRACEInputCheckMapper.java:221-255`).
  *
  * Plan shape: ONE scan of the study side, broadcast hash join against the
  * (already last-wins-deduped) panel, and a single partial+final aggregate —
  * the Spark-native equivalent of the reference's per-task heap HashMap with
  * zero shuffles on the big side. At 100 TB the study side streams through
  * executors while the panel (site lists are ~10⁶ rows) broadcasts.
  */
object SharedLoci {

  /** Residual allele predicate: order-sensitive, case-insensitive. */
  private def alleleMatch = lower(concat_ws("/", col("ref"), col("alt"))) === lower(col("alleles"))

  /** study(chr, pos, ref, alt) × panel(chr, pos, alleles) →
    * one row (total BIGINT, shared BIGINT). */
  def counts(study: DataFrame, panel: DataFrame): DataFrame = {
    val p = broadcast(panel.select(
      col("chr").as("p_chr"), col("pos").as("p_pos"), col("alleles")))
    study
      .join(p, col("chr") === col("p_chr") && col("pos") === col("p_pos") && alleleMatch, "left")
      .agg(count(lit(1)).as("total"), count(col("p_chr")).as("shared"))
  }

  /** Per-group counts (e.g. per input file, `groupCol`) in the SAME single
    * broadcast-join pass — the multi-VCF TRACE shape: one job for any
    * number of files, mirroring the reference's per-file counter groups
    * (`TRACEInputCheckMapper.java:267-269`) inside one MapReduce job. */
  def countsBy(study: DataFrame, panel: DataFrame, groupCol: String): DataFrame = {
    val p = broadcast(panel.select(
      col("chr").as("p_chr"), col("pos").as("p_pos"), col("alleles")))
    study
      .join(p, col("chr") === col("p_chr") && col("pos") === col("p_pos") && alleleMatch, "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("total"), count(col("p_chr")).as("shared"))
  }

  /** The matching loci themselves (semi-join form) — the rows the planned
    * VCF chunking would have written (`TRACEInputCheckMapper.java:186-266`,
    * commented out in the reference). */
  def sharedRows(study: DataFrame, panel: DataFrame): DataFrame = {
    val p = broadcast(panel.select(
      col("chr").as("p_chr"), col("pos").as("p_pos"), col("alleles")))
    study.join(p,
      col("chr") === col("p_chr") && col("pos") === col("p_pos") && alleleMatch,
      "left_semi")
  }
}
