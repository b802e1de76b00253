package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R24/R25/R30: downstream job-descriptor emission.
  *
  * The descriptor families and their JSON keys are the repo's contract with
  * the (out-of-scope) PCA binaries: LASER inputcheck batch — bare JSON line
  * (`LASERInputValidator.java:103-111`); reference-PCA / per-chunk study-PCA
  * / vcf2geno batches — `"%d\t%s\n"` key-TSV-JSON framing
  * (`LASERInputValidator.java:157-183`, `TRACEJobGenerator.java:44-93`);
  * study meta JSON (`TRACEInputValidator.java:240-247`).
  *
  * Descriptor sets are metadata-scale DataFrames; the file writes are
  * driver-side by design.
  */
object Descriptors {

  /** Per-chunk study-PCA descriptors (`LASERInputValidator.java:168-182`). */
  def laserStudyPca(spark: SparkSession, chunks: Long, chunksDir: String,
      siteFile: String, reference: String, referencePc: String,
      dim: Int, dimHigh: Int): DataFrame =
    spark.range(chunks).select(
      col("id").as("key"),
      to_json(struct(
        lit(reference).as("reference"),
        lit(referencePc).as("reference_pc"),
        concat(lit(s"$chunksDir/"), col("id"), lit(".chunk.seq.gz")).as("seq"),
        lit(siteFile).as("site"),
        lit(dim).as("dim"),
        lit(dimHigh).as("dim_high"))).as("json"),
      concat(col("id"), lit(".batch")).as("file"))

  /** Reference-PCA descriptor (`LASERInputValidator.java:158-164`). */
  def referencePca(spark: SparkSession, reference: String, referencePc: String,
      dim: Int): DataFrame =
    spark.range(1).select(
      lit(1L).as("key"),
      to_json(struct(lit(reference).as("reference"),
        lit(referencePc).as("reference_pc"), lit(dim).as("dim"))).as("json"),
      lit("reference_pca_job.batch").as("file"))

  /** vcf2geno + study-PCA batch descriptor pairs (`TRACEJobGenerator.java:52-93`). */
  def traceBatches(batches: DataFrame, reference: String, referencePc: String,
      studyVcf: String, studyGeno: String, dim: Int, dimHigh: Int): DataFrame =
    batches.select(
      col("batch").as("key"),
      to_json(struct(col("batch_id").as("batch"), col("start"), col("end"),
        lit(reference).as("reference"), lit(studyVcf).as("study_vcf"))).as("vcf2geno_json"),
      to_json(struct(col("batch_id").as("batch"), col("start"), col("end"),
        lit(reference).as("reference"), lit(referencePc).as("reference_pc"),
        lit(studyGeno).as("study_geno"), lit(dim).as("dim"),
        lit(dimHigh).as("dim_high"))).as("study_pca_json"),
      concat(col("batch"), lit(".batch")).as("file"))

  /** Study meta JSON (`TRACEInputValidator.java:240-247`). */
  def studyMetaJson(individuals: Long, totalLoci: Long, sharedLoci: Long,
      format: String): String =
    s"""{"Individuals":$individuals,"Total loci":$totalLoci,""" +
      s""""Shared loci":$sharedLoci,"Format":"$format"}"""

  /** Write each descriptor row as its own exactly-named file with
    * `"%d\t%s\n"` framing. Distributed: each task writes its partition's
    * files (same discipline as `ChunkSink`) — the reference's driver loop
    * (`LASERInputValidator.java:168-182`) serializes 1 file per chunk
    * through one process, which stops scaling at the 10⁶–10⁷ chunk counts
    * the chunking design note targets. */
  def writeKeyed(df: DataFrame, outDir: String, jsonCol: String = "json"): Unit = {
    // session Hadoop conf, not executor-default (see HadoopConf)
    val hconf = graft.sources.HadoopConf.of(df)
    df.select(col("key"), col(jsonCol), col("file"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(hconf.value)
        // Attempt-unique temp + rename (ChunkSink's commit discipline):
        // speculative/retried attempts of the same task must never race a
        // direct create(overwrite) on the exact name — a reader could see a
        // partially-written descriptor. Every attempt writes its OWN temp
        // file; the rename is atomic per attempt, and since all attempts of
        // a task produce identical bytes, whichever rename lands last leaves
        // the same content.
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        rows.foreach { r =>
          val target = new org.apache.hadoop.fs.Path(outDir, r.getString(2))
          val tmp = new org.apache.hadoop.fs.Path(outDir,
            s".${r.getString(2)}.$attempt.tmp")
          try {
            val out = fs.create(tmp, true)
            try out.write(s"${r.getLong(0)}\t${r.getString(1)}\n".getBytes("UTF-8"))
            finally out.close()
            // rename refuses an existing destination on some filesystems.
            // All attempts of a row write identical bytes, so an existing
            // target IS the committed result — drop the tmp and move on
            // rather than delete-then-rename, which would open a window
            // where a concurrent reader sees the target missing (and a
            // crash between the delete and the rename would un-commit a
            // previously complete descriptor).
            if (!fs.rename(tmp, target)) {
              if (fs.exists(target)) fs.delete(tmp, false)
              else throw new java.io.IOException(
                s"writeKeyed: rename $tmp -> $target failed with no committed target")
            }
          } catch {
            case e: Throwable =>
              // no half-written .tmp residue on failed attempts
              try fs.delete(tmp, false) catch { case _: Throwable => () }
              throw e
          }
        }
      }
  }
}
