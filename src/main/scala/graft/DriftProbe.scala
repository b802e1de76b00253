package graft

import graft.operators.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Drift-monitor cost probe (round 14): measures the family's core claim
  * (`Curation.buildDriftIndex` scaladoc) — a per-arrival PSI probe against
  * the persisted histograms is O(batch + bins), INDEPENDENT of the
  * standing corpus, because the probe reads the metadata-scale bin table
  * and scans only the batch; the counterfactual `Curation.drift` recomputes
  * the standing histograms on every arrival and grows with the corpus.
  *
  * Arms, interleaved at each standing size 1×/2×/4×/8× of the sf corpus
  * (copies id-shifted, texts salted with a copy token so the histograms
  * move, not just repeat):
  *   - one-time histogram build at that standing size (the amortized cost)
  *   - recompute arm: `drift(standing, fixed batch)`
  *   - probe arm: `driftAgainstIndex(index, fixed batch)`
  * The flat probe line against the growing recompute line is the claim.
  * Every arm's 3-row result is asserted identical to the recompute's —
  * the probe must be a pure cost change, never a semantics change.
  *
  * Usage: runMain graft.DriftProbe <sfDir> [maxFactor=8]
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DriftProbe <sfDir> [maxFactor]")
    val dir = args(0)
    val maxFactor = if (args.length > 1) args(1).toInt else 8
    val spark = ProbeHarness.session()
    val cpus = spark.sparkContext.defaultParallelism
    val root = "/tmp/graft-driftprobe"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val features = Seq(
      "chars" -> floor(length(col("text")) / lit(256)),
      "lang" -> col("lang"),
      "tokens" -> floor(size(split(col("text"), " ")) / lit(64)))
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val nBase = base.count()
    def corpusAt(factor: Int): DataFrame = base
      .select(explode(sequence(lit(0), lit(factor - 1))).as("c"),
        col("doc_id"), col("lang"), col("text"))
      .select((col("doc_id") + col("c") * 10000000L).as("doc_id"),
        col("lang"), concat(col("text"), lit(" copysalt"), col("c")).as("text"))
      .repartition(cpus)
    val batch = base.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 900000000L).as("doc_id"), col("lang"),
        concat(col("text"), lit(" arrives")).as("text"))
      .persist()
    println(s"[drift] base $nBase docs from $dir; fixed batch " +
      s"${batch.count()} docs; standing factors 1..$maxFactor")
    // untimed warmup write (first parquet write pays JIT/committer setup)
    Curation.buildDriftIndex(batch, features, s"$root/warmup")

    var factor = 1
    while (factor <= maxFactor) {
      // standing lives ON DISK (the operational shape): the recompute arm
      // pays a real file scan that grows with the corpus; the probe arm
      // must never touch these files at all
      corpusAt(factor).write.parquet(s"$root/f$factor/standing")
      val standing = spark.read.parquet(s"$root/f$factor/standing")
      val idx = s"$root/f$factor/index"
      val (buildSec, _) = ProbeHarness.time {
        Curation.buildDriftIndex(standing, features, idx)
      }
      // bytes evidence: wall time is chain-overhead-dominated at local
      // corpus sizes, so the structural claim is what each arm READS —
      // the recompute arm's scans grow with the standing corpus, the
      // probe arm's must stay at (batch + index) bytes forever
      def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          fileScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          fileScans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(fileScans)
      }
      def scanBytes(df: DataFrame): Long = {
        val scans = fileScans(df.queryExecution.executedPlan)
        require(scans.nonEmpty,
          "no FileSourceScanExec leaf — plan shape changed, bytes invalid")
        scans.map(_.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum
      }
      val (recomputeSec, (want, reBytes)) = ProbeHarness.time {
        val df = Curation.drift(standing, batch, features)
        val rows = df.collect().toSeq
        (rows, scanBytes(df))
      }
      val (probeSec, (got, prBytes)) = ProbeHarness.time {
        val df = Curation.driftAgainstIndex(idx, batch, features)
        val rows = df.collect().toSeq
        (rows, scanBytes(df))
      }
      require(got == want,
        s"index-probed PSI must equal recomputed PSI at ${factor}x: $got vs $want")
      println(f"[drift] standing ${factor}x (${nBase * factor}%8d docs): " +
        f"build $buildSec%6.2f s, recompute $recomputeSec%6.2f s " +
        f"(${reBytes / 1024}%8d KB read), probe $probeSec%6.2f s " +
        f"(${prBytes / 1024}%6d KB read)")
      factor *= 2
    }
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
