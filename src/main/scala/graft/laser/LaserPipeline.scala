package graft.laser

import graft.domain.{ErrorSummary, Errors, ValidationError}
import graft.operators.{ChunkSink, SharedLoci}
import graft.sources._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The LASER input-check workflow (`LASERInputValidator.run`,
  * `LASERInputCheckMapper.java:272-301`): validate groups → seq → site
  * against the reference panel, chunk the seq file, and report counters.
  *
  * The reference short-circuits file-at-a-time and row-at-a-time; the engine
  * computes each file's validation set and reports the highest-precedence
  * error (`Errors.firstError` — same driver-visible outcome,
  * `LASERInputValidator.java:135-140`). Gates (R23): `individuals == 0` and
  * `sharedLoci <= 100` (`:147-155`).
  */
object LaserPipeline {

  /** `errorCounts` is the complete per-code tally (the reference's counter
    * contract); `errors` carries ≤ sampleK examples per code — the full
    * finding set is never materialized on the driver (R22 at 100 TB). */
  final case class Result(
      firstError: Option[Errors.Code],
      errors: Seq[ValidationError],
      errorCounts: Map[String, Long],
      individuals: Long,
      totalLoci: Long,
      sharedLoci: Long,
      chunks: Long) {
    /** Threshold gates (`LASERInputValidator.java:147-155`). */
    def gateMessages: Seq[String] = {
      val g1 = if (firstError.isEmpty && individuals == 0)
        Seq("No individuals found in study sequence file!") else Nil
      val g2 = if (firstError.isEmpty && sharedLoci <= 100)
        Seq("Too few loci shared between study and reference panel! PCA will not be informative!")
      else Nil
      g1 ++ g2
    }
    def ok: Boolean = firstError.isEmpty && gateMessages.isEmpty
  }

  /** Pure-DataFrame core shared by the file pipeline and the inline-fixture
    * query: all inputs already as line sets. `chunksOut = None` skips the
    * side-effecting chunk write (validation-only runs). */
  def run(
      seqLines: DataFrame,
      siteLines: DataFrame,
      panelLines: DataFrame,
      groupsLines: Option[DataFrame],
      chunksOut: Option[String] = None,
      chunkSize: Int = 100,
      preErrors: Seq[ValidationError] = Nil): Result = {

    val spark = seqLines.sparkSession

    val groupsDf = groupsLines.map(GroupsReader.parse)
    // Bounded error channel: the three validators UNION into one dataset
    // and reduce to per-code counts + capped samples in a single job
    // (ErrorSummary.of) — an input where every row is broken stays
    // O(#codes × k) on the driver, and the happy path pays one validation
    // job, not three.
    val fileSum = ErrorSummary.of(
      groupsLines.map(GroupsReader.validate)
        .getOrElse(seqLines.sparkSession.emptyDataset[ValidationError](
          org.apache.spark.sql.Encoders.product[ValidationError]))
        .union(SeqReader.validate(seqLines, groupsDf))
        .union(SiteReader.validate(siteLines)))

    val seqParsed = SeqReader.parse(seqLines)
    // One aggregate pass: individuals (distinct) + locus-count consensus
    // (TreeSet-min semantics, `LASERInputCheckMapper.java:254-258` uses
    // `.first()` = the minimum).
    val seqAgg = seqParsed.agg(
      countDistinct(col("indiv_id")).as("individuals"),
      min(col("n_loci")).as("min_loci")).collect()(0)
    val individuals = seqAgg.getLong(0)
    val minLoci = if (seqAgg.isNullAt(1)) 0L else seqAgg.getLong(1)

    val site = SiteReader.parse(siteLines)
    val panel = PanelReader.parse(panelLines)
    val countsRow = SharedLoci.counts(site.select("chr", "pos", "ref", "alt"), panel).collect()(0)
    val (totalLoci, sharedLoci) = (countsRow.getLong(0), countsRow.getLong(1))

    // R20: site row count must equal the seq locus count — only when the
    // site file itself validated (the reference aborts the site scan on a
    // header error before ever counting, `LASERInputCheckMapper.java:203-235`).
    val siteFailed = fileSum.counts.keys.exists(SiteReader.codes)
    val crossSum =
      if (!siteFailed && totalLoci != minLoci)
        ErrorSummary.ofSeq(Seq(ValidationError("SITE_FILE_LOCI_NOT_IN_SEQ",
          detail = s"site rows $totalLoci != seq loci $minLoci")))
      else ErrorSummary.empty

    val all = ErrorSummary.ofSeq(preErrors) ++ fileSum ++ crossSum

    val chunks = chunksOut match {
      case Some(dir) if all.firstError.isEmpty =>
        ChunkSink.write(seqLines, dir, chunkSize)
      case _ =>
        // chunk count is still well-defined without the write
        val n = seqLines.count()
        (n + chunkSize - 1) / chunkSize
    }

    Result(all.firstError, all.samples, all.counts,
      individuals, totalLoci, sharedLoci, chunks)
  }

  /** Post-gate descriptor emission (`LASERInputValidator.java:157-183`):
    * ONE reference-PCA descriptor plus one study-PCA descriptor per chunk,
    * written only for a fully successful run — the same position in the
    * workflow as the reference (after the gates, before the seq delete).
    * Distributed via `Descriptors.writeKeyed` (exact names). */
  def emitJobs(spark: SparkSession, result: Result, chunksDir: String,
      siteFile: String, reference: String, referencePc: String,
      dim: Int, dimHigh: Int, referenceJobDir: String, studyJobDir: String): Boolean = {
    if (!result.ok) false
    else {
      graft.domain.Descriptors.writeKeyed(
        graft.domain.Descriptors.referencePca(spark, reference, referencePc, dim),
        referenceJobDir)
      graft.domain.Descriptors.writeKeyed(
        graft.domain.Descriptors.laserStudyPca(spark, result.chunks, chunksDir,
          siteFile, reference, referencePc, dim, dimHigh),
        studyJobDir)
      true
    }
  }

  /** File-backed entry point mirroring `LASERInputValidator.run`: gzip
    * sniffs (R1) happen before any scan, exactly as the reference raises
    * `*_IS_NOT_GZIP` pre-parse (`LASERInputCheckMapper.java:108-111,191-195`). */
  def runFiles(spark: SparkSession, seqPath: String, sitePath: String,
      panelPath: String, groupsPath: Option[String], chunksOut: Option[String],
      chunkSize: Int = 100, deleteSeqAfterChunks: Boolean = false): Result = {
    val pre = Seq(
      (!Lines.isGzip(spark, seqPath), "SEQ_FILE_IS_NOT_GZIP"),
      (!Lines.isGzip(spark, sitePath), "SITE_FILE_IS_NOT_GZIP"),
    ).collect { case (true, code) => ValidationError(code) }
    if (pre.nonEmpty)
      Result(Errors.firstError(pre.map(_.code -> 1L).toMap), pre,
        pre.map(_.code -> 1L).toMap, 0, 0, 0, 0)
    else {
      val r = run(
        Lines.read(spark, seqPath),
        Lines.read(spark, sitePath),
        Lines.read(spark, panelPath),
        groupsPath.filter(_.nonEmpty).map(Lines.read(spark, _)),
        chunksOut, chunkSize)
      // R29: the reference deletes the original seq file strictly after
      // job success, error scan, AND both threshold gates
      // (`LASERInputValidator.java:186` sits below the gate returns at
      // `:147-155`) — so gate on `r.ok`, not just firstError.
      if (deleteSeqAfterChunks && r.ok && chunksOut.nonEmpty) {
        val p = new org.apache.hadoop.fs.Path(seqPath)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
      }
      r
    }
  }
}
