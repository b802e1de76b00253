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

  /** Multi-file run: format dispatch (R7), per-file stats, cross-file
    * individual-count agreement (TreeSet-size check,
    * `TRACEInputValidator.java:230-233`), `sharedLoci <= 100` gate (`:235-238`).
    *
    * ONE distributed pass for any number of files — the reference validates
    * every VCF inside a single MapReduce job with per-file counter groups
    * (`TRACEInputCheckMapper.java:267-269`); a file-at-a-time loop would run
    * O(#files) Spark jobs. Shape: union all line sets with a `file` tag,
    * then (1) one `min_by` aggregate extracts every header line (#files
    * rows of driver metadata), (2) header rules run driver-side on those
    * strings, (3) one anti-join checks every file's samples against the
    * groups table, (4) one grouped broadcast-join pass counts total/shared
    * loci for all clean files (`SharedLoci.countsBy`). */
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

    // Empty input list (e.g. a glob that matched nothing): a well-formed
    // Result, with the shared-loci gate firing exactly as a zero-stat run
    // would (sum 0 <= 100) — the union/reduce below would otherwise throw.
    if (files.isEmpty)
      return Result(None, Nil, Map.empty, Nil,
        Seq("Too few loci shared between study and reference panel! PCA will not be informative!"))

    val spark = panelLines.sparkSession
    import spark.implicits._
    val panel = PanelReader.parse(panelLines)
    val groups = groupsLines.map(GroupsReader.parse)
    val groupSum = groupsLines.map(g => ErrorSummary.of(GroupsReader.validate(g)))
      .getOrElse(ErrorSummary.empty)

    val unioned = files.map { case (id, df) => df.withColumn("file", lit(id)) }
      .reduce(_ unionByName _)

    // (1) per-file header line (first non-## line) — bounded metadata.
    val headerRows = unioned.where(!col("line").startsWith("##"))
      .groupBy(col("file"))
      .agg(min_by(col("line"), col("idx")).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val headers: Seq[(String, Option[String])] =
      files.map { case (id, _) => id -> headerRows.get(id) }

    // (2) header-string rules, driver-side on #files strings.
    val headerErrsByFile: Map[String, Seq[ValidationError]] =
      headers.map { case (id, h) =>
        id -> VcfReader.validateHeaderString(h).map(_.copy(file = id))
      }.toMap
    val headerSum = ErrorSummary.ofSeq(files.flatMap(f => headerErrsByFile(f._1)))

    // (3) sample membership for every clean-header file in one anti-join.
    val samplePairs = headers.flatMap { case (id, h) =>
      VcfReader.samplesOf(h).map(s => (id, s))
    }
    val (memberSum, memberErrFiles) = groups match {
      case Some(g) if samplePairs.nonEmpty =>
        // persist: two consuming actions (summary aggregate + errored-file
        // collect) over one anti-join; released as soon as both complete so
        // repeated pipeline runs in one session don't accumulate blocks.
        val missing = samplePairs.toDF("file", "s")
          .join(broadcast(g.select(col("sample"))), col("s") === col("sample"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val sum = ErrorSummary.of(missing.as[(String, String)]
            .map { case (f, s) => ValidationError("VCF_SAMPLE_NOT_IN_GROUP", file = f, detail = s) })
          val errFiles = missing.select("file").distinct().as[String].collect().toSet
          (sum, errFiles)
        } finally missing.unpersist(false)
      case _ => (ErrorSummary.empty, Set.empty[String])
    }

    // (4) total/shared loci for all clean files in one grouped pass; a
    // clean file with zero body rows simply has no group row → (0, 0).
    val erroredFiles = headerErrsByFile.filter(_._2.nonEmpty).keySet ++ memberErrFiles
    val cleanIds = files.map(_._1).filterNot(erroredFiles)
    val statsByFile: Map[String, (Long, Long)] =
      if (cleanIds.isEmpty) Map.empty
      else {
        val t = split(col("line"), "\t")
        val body = unioned
          .where(col("file").isin(cleanIds: _*))
          .where(!col("line").startsWith("#"))
          .select(col("file"), t.getItem(0).as("chr"), get(t, lit(1)).as("pos"),
            get(t, lit(3)).as("ref"), get(t, lit(4)).as("alt"))
        SharedLoci.countsBy(body, panel, "file").collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      }

    val samplesByFile = headers.toMap
    val stats = files.map { case (id, _) =>
      if (erroredFiles.contains(id)) FileStats(id, 0, 0, 0)
      else {
        val (total, shared) = statsByFile.getOrElse(id, (0L, 0L))
        FileStats(id, VcfReader.samplesOf(samplesByFile(id)).distinct.size, total, shared)
      }
    }
    val errs = groupSum ++ headerSum ++ memberSum
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
