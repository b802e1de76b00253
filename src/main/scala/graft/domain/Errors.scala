package graft.domain

/** The reference's validation-error taxonomy, re-expressed as data.
  *
  * Semantics derived from `MapReduceError.java:2-33` (enum declaration order
  * — which IS the reporting precedence: the driver scans `Errors.values()` in
  * order and reports the first counter > 0, `LASERInputValidator.java:135-140`,
  * `TRACEInputValidator.java:214-219`) and `:35-69` (messages).
  */
object Errors {
  final case class Code(name: String, ordinal: Int, message: String)

  private val defs: Seq[(String, String)] = Seq(
    "SEQ_FILE_IS_NOT_GZIP" -> "Study sequence file must be compressed using Gzip!",
    "SITE_FILE_IS_NOT_GZIP" -> "Study site file must be compressed using Gzip!",
    "VCF_IS_NOT_GZIP" -> "Input VCF(s) must be compressed using Gzip!",
    "FILE_FORMAT_NOT_SUPPORTED" -> "Provided study genotypes file format is not supported!",
    "GROUPS_FILE_TOO_MANY_COLUMNS" -> "Study groups file has line(s) with more than two columns!",
    "GROUPS_FILE_MISSING_COLUMNS" -> "Study groups file has line(s) with less than two columns!",
    "SEQ_FILE_TOO_FEW_COLUMNS" -> "One or more lines in study sequence file have less than five columns!",
    "SEQ_FILE_MISSING_COLUMNS" -> "Columns are missing in one or more lines in study sequence file!",
    "SEQ_FILE_INCONSISTENT_COLUMNS" -> "One or more lines in study sequence file have different number of columns!",
    "SEQ_SAMPLE_NOT_IN_GROUP" -> "One or more individuals from study sequence file are not present in study groups file!",
    "SITE_FILE_TOO_FEW_COLUMNS" -> "Site file has less than five columns!",
    "SITE_FILE_HEADER_NO_CHR" -> "No 'CHR' column in site file!",
    "SITE_FILE_HEADER_NO_POS" -> "No 'POS' column in site file!",
    "SITE_FILE_HEADER_NO_ID" -> "No 'ID' column in site file!",
    "SITE_FILE_HEADER_NO_REF" -> "No 'REF' column in site file!",
    "SITE_FILE_HEADER_NO_ALT" -> "No 'ALT' column in site file!",
    "SITE_FILE_LOCI_NOT_IN_SEQ" -> "Study sequence and site files have different number of loci!",
    "VCF_SAMPLE_NOT_IN_GROUP" -> "One or more individuals from study VCF file(s) are not present in study groups file!",
    "VCF_NO_HEADER" -> "VCF file has no header!",
    "VCF_HEADER_NO_SAMPLES" -> "VCF file has no individuals!",
    "VCF_HEADER_NO_CHROM" -> "No '#CHROM' column in VCF file!",
    "VCF_HEADER_NO_POS" -> "No 'POS' column in VCF file!",
    "VCF_HEADER_NO_ID" -> "No 'ID' column in VCF file!",
    "VCF_HEADER_NO_REF" -> "No 'REF' column in VCF file!",
    "VCF_HEADER_NO_ALT" -> "No 'ALT' column in VCF file!",
    "VCF_HEADER_NO_QUAL" -> "No 'QUAL' column in VCF file!",
    "VCF_HEADER_NO_FILTER" -> "No 'FILTER' column in VCF file!",
    "VCF_HEADER_NO_INFO" -> "No 'INFO' column in VCF file!",
    "VCF_HEADER_NO_FORMAT" -> "No 'FORMAT' column in VCF file!",
    // Defined but never raised in the reference (`MapReduceError.java:32` has
    // no increment site) — kept for taxonomy completeness.
    "VCF_HIGH_PLOIDITY" -> "Only up to 126-ploid organisms are supported!",
  )

  val all: Seq[Code] = defs.zipWithIndex.map { case ((n, m), i) => Code(n, i, m) }
  private val byName: Map[String, Code] = all.map(c => c.name -> c).toMap

  def apply(name: String): Code = byName(name)
  def ordinal(name: String): Int = byName(name).ordinal
  def message(name: String): String = byName(name).message

  /** Driver-side reporting rule: the first declared error with count > 0
    * (`LASERInputValidator.java:135-140`). */
  def firstError(counts: Map[String, Long]): Option[Code] =
    all.find(c => counts.getOrElse(c.name, 0L) > 0)
}

/** One validation finding. The reference only keeps per-code counters; the
  * engine additionally carries the offending row/file for debuggability —
  * an upgrade the counter contract permits (`SURVEY.md §2.1 R22`).
  */
final case class ValidationError(
    code: String,
    ordinal: Int,
    file: String,
    line: Long,
    detail: String)

object ValidationError {
  def apply(code: String, file: String = "", line: Long = -1L,
      detail: String = ""): ValidationError =
    ValidationError(code, Errors.ordinal(code), file, line, detail)
}

/** Bounded reporting of a validation-error set: per-code counts (all the
  * reference's reporting rule ever consumes — it only keeps Hadoop counters,
  * `LASERInputValidator.java:135-140`) plus ≤ `sampleK` example rows per
  * code for debuggability.
  *
  * Scale: the error channel is exactly where pathological inputs live — a
  * seq file where EVERY row is arity-broken must not collect billions of
  * findings to the driver. `of` reduces the error set distributedly to
  * O(#codes × sampleK) rows before anything reaches the driver.
  */
final case class ErrorSummary(
    counts: Map[String, Long],
    samples: Seq[ValidationError]) {
  def isEmpty: Boolean = counts.isEmpty
  def total: Long = counts.values.sum
  def firstError: Option[Errors.Code] = Errors.firstError(counts)
  def ++(other: ErrorSummary): ErrorSummary = ErrorSummary(
    (counts.keySet ++ other.counts.keySet).iterator
      .map(c => c -> (counts.getOrElse(c, 0L) + other.counts.getOrElse(c, 0L))).toMap,
    samples ++ other.samples)
  /** Re-tag samples with the originating file id (TRACE per-file runs). */
  def inFile(fileId: String): ErrorSummary =
    copy(samples = samples.map(_.copy(file = fileId)))
}

object ErrorSummary {
  import org.apache.spark.sql.Dataset
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  val empty: ErrorSummary = ErrorSummary(Map.empty, Nil)

  /** For driver-side error seqs (pre-scan gzip sniffs, cross-checks). */
  def ofSeq(errs: Seq[ValidationError]): ErrorSummary =
    ErrorSummary(errs.groupBy(_.code).map { case (c, es) => c -> es.size.toLong }, errs)

  /** Distributed reduction: one window + one same-key aggregate (a single
    * shuffle on `code`); `count` sees every row, `collect_list` only the
    * ≤ sampleK row-number survivors per code. */
  def of(errs: Dataset[ValidationError], sampleK: Int = 10): ErrorSummary = {
    val rows = errs.toDF()
      .withColumn("rn", row_number().over(
        Window.partitionBy("code").orderBy("line", "file", "detail")))
      .groupBy("code", "ordinal")
      .agg(count(lit(1)).as("cnt"),
        collect_list(when(col("rn") <= sampleK,
          struct(col("file"), col("line"), col("detail")))).as("ex"))
      .collect()
    val counts = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    // collect_list gathers in partition-arrival order — sort for a
    // deterministic Result.errors sequence (bit-reproducibility contract).
    val samples = rows.flatMap { r =>
      r.getSeq[org.apache.spark.sql.Row](3).map(e =>
        ValidationError(r.getString(0), r.getInt(1),
          e.getString(0), e.getLong(1), e.getString(2)))
    }.sortBy(e => (e.ordinal, e.file, e.line, e.detail)).toSeq
    ErrorSummary(counts, samples)
  }
}
