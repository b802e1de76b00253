package graft.trace

import graft.domain.{Descriptors, ErrorSummary, Errors, ValidationError}
import graft.operators.{RangeBatch, SharedLoci}
import graft.sources._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TRACE workflow (`TRACEInputValidator.run` +
  * `TRACEInputCheckMapper.java:301-340`): per-VCF validation against the
  * panel, per-file counters (`("INDIVIDUALS"|"TOTAL_SITES"|"SHARED_SITES"),
  * fileId` groups, `:267-269`), then cross-file consistency + threshold
  * gates (`TRACEInputValidator.java:221-238`) and the study meta JSON.
  */
object TracePipeline {

  final case class FileStats(fileId: String, individuals: Long,
      totalLoci: Long, sharedLoci: Long)

  /** `errorCounts` = complete per-code tally; `errors` = ≤ k samples per
    * code (bounded error channel, see `ErrorSummary`). */
  final case class Result(
      firstError: Option[Errors.Code],
      errors: Seq[ValidationError],
      errorCounts: Map[String, Long],
      perFile: Seq[FileStats],
      gateMessages: Seq[String]) {
    def individuals: Long = perFile.headOption.map(_.individuals).getOrElse(0L)
    def totalLoci: Long = perFile.map(_.totalLoci).sum
    def sharedLoci: Long = perFile.map(_.sharedLoci).sum
    def ok: Boolean = firstError.isEmpty && gateMessages.isEmpty
    def metaJson(format: String): String =
      Descriptors.studyMetaJson(individuals, totalLoci, sharedLoci, format)
  }

  /** Validate + count one VCF (already as lines) against the panel. */
  def runOne(fileId: String, vcfLines: DataFrame, panel: DataFrame,
      groups: Option[DataFrame]): (ErrorSummary, FileStats) = {
    val errs = ErrorSummary.of(VcfReader.validateHeader(vcfLines, groups))
    if (!errs.isEmpty) (errs.inFile(fileId), FileStats(fileId, 0, 0, 0))
    else {
      val parsed = VcfReader.parse(vcfLines)
      val counts = SharedLoci.counts(
        parsed.body.select(col("chrom").as("chr"), col("pos"), col("ref"), col("alt")),
        panel).collect()(0)
      (ErrorSummary.empty, FileStats(fileId, parsed.samples.distinct.size,
        counts.getLong(0), counts.getLong(1)))
    }
  }

  /** Multi-file run: format dispatch (R7), per-file stats, cross-file
    * individual-count agreement (TreeSet-size check,
    * `TRACEInputValidator.java:230-233`), `sharedLoci <= 100` gate (`:235-238`). */
  def run(files: Seq[(String, DataFrame)], panelLines: DataFrame,
      groupsLines: Option[DataFrame], format: String = "vcf"): Result = {

    VcfReader.dispatch(format) match {
      case Left(err) =>
        return Result(Some(Errors(err.code)), Seq(err), Map(err.code -> 1L), Nil, Nil)
      case Right(f) if f.endsWith("-stub") =>
        // 23andMe / AncestryDNA are honest stubs in the reference
        // (`TRACEInputCheckMapper.java:275-293`): accepted, no validation.
        return Result(None, Nil, Map.empty,
          files.map { case (id, _) => FileStats(id, 0, 0, 0) }, Nil)
      case Right(_) =>
    }

    val panel = PanelReader.parse(panelLines)
    val groups = groupsLines.map(GroupsReader.parse)
    val groupSum = groupsLines.map(g => ErrorSummary.of(GroupsReader.validate(g)))
      .getOrElse(ErrorSummary.empty)

    val results = files.map { case (id, lines) => runOne(id, lines, panel, groups) }
    val errs = results.map(_._1).foldLeft(groupSum)(_ ++ _)
    val stats = results.map(_._2)
    val firstErr = errs.firstError

    val gates = if (firstErr.isEmpty) {
      val distinctIndiv = stats.map(_.individuals).distinct
      val g1 = if (distinctIndiv.size > 1)
        Seq("Input VCF files have different number of individuals!") else Nil
      val g2 = if (g1.isEmpty && stats.map(_.sharedLoci).sum <= 100)
        Seq("Too few loci shared between study and reference panel! PCA will not be informative!")
      else Nil
      g1 ++ g2
    } else Nil

    Result(firstErr, errs.samples, errs.counts, stats, gates)
  }

  /** R25 + R24: the TRACEJobGenerator step — emit vcf2geno + study-PCA
    * descriptor pairs for `1..nIndividuals` in `batchSize` windows. */
  def generateJobs(spark: SparkSession, nIndividuals: Long, batchSize: Int,
      reference: String, referencePc: String, studyVcf: String,
      studyGeno: String, dim: Int, dimHigh: Int): DataFrame =
    Descriptors.traceBatches(RangeBatch.batches(spark, nIndividuals, batchSize),
      reference, referencePc, studyVcf, studyGeno, dim, dimHigh)
}
