package graft

import graft.operators.LangModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** LM-scoring cost probe (round 16): measures the family's core claim
  * (`LangModel` scaladoc) — scoring a fixed batch against the PERSISTED
  * model is O(batch + vocabulary), INDEPENDENT of the training corpus,
  * because the probe reads only the count tables; the counterfactual
  * `LangModel.ppl` retrains on every arrival and its scan cost grows with
  * the corpus. The synthetic vocabulary is closed (31 words + salt), so
  * the model tables stay near-constant bytes while the training corpus
  * grows — the extreme version of the vocabulary≪corpus regime the
  * operator is designed for.
  *
  * Arms, interleaved at each standing size 1×/2×/4×/8× (copies id-shifted
  * and text-salted, the DriftProbe build):
  *   - one-time model build at that standing size (the amortized cost)
  *   - recompute arm: `ppl(standing, fixed batch)`
  *   - probe arm: `scoreAgainstLmIndex(index, fixed batch)`
  * Every probe result is asserted identical to the recompute's — a pure
  * cost change, never a semantics change. Bytes evidence: what each arm's
  * file scans READ (recompute grows with standing; probe stays at
  * batch + model bytes).
  *
  * Usage: runMain graft.LmProbe <sfDir> [maxFactor=8]
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LmProbe <sfDir> [maxFactor]")
    val dir = args(0)
    val maxFactor = if (args.length > 1) args(1).toInt else 8
    val spark = ProbeHarness.session()
    val cpus = spark.sparkContext.defaultParallelism
    val root = "/tmp/graft-lmprobe"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val nBase = base.count()
    def corpusAt(factor: Int): DataFrame = base
      .select(explode(sequence(lit(0), lit(factor - 1))).as("c"),
        col("doc_id"), col("text"))
      .select((col("doc_id") + col("c") * 10000000L).as("doc_id"),
        concat(col("text"), lit(" copysalt"), col("c")).as("text"))
      .repartition(cpus)
    val batch = base.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 900000000L).as("doc_id"),
        concat(col("text"), lit(" arrives")).as("text"))
      .persist()
    println(s"[lm] base $nBase docs from $dir; fixed batch " +
      s"${batch.count()} docs; standing factors 1..$maxFactor")
    LangModel.buildLmIndex(batch, s"$root/warmup") // untimed JIT/committer warmup

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

    // ---- vocabulary arm (r17): the write path must SCALE WITH VOCABULARY
    // — count tables are written repartitionByRange on the word key with
    // AQE sizing the shuffle, so the closed 31-word fixture lands one
    // file while a 100×-vocabulary corpus lands many, and the range
    // layout keeps a word-bounded scan file-pruned (parquet min/max).
    // The old repartition(1) wrote ONE file/task regardless — the
    // bottleneck this arm exists to disprove.
    {
      // alphabetic salt (the [a-z]+ tokenizer drops digits): doc_id%100
      // spelled in letters → every word gains 100 variants
      val salt = translate(pmod(col("doc_id"), lit(100)).cast("string"),
        "0123456789", "abcdefghij")
      val vocabCorpus = base.select(col("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("x"), salt)), " ").as("text"))
      val idx = s"$root/vocab/model"
      // the file count comes from AQE sizing the range shuffle
      // (bytes / advisoryPartitionSizeInBytes) — dial the advisory down
      // so a fixture-scale table exercises the same multi-file path a
      // billion-row bigram table takes at the 64 MB default
      val tuned = Seq(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16384")
      val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      val (buildSec, _) = ProbeHarness.time {
        LangModel.buildLmIndex(vocabCorpus, idx)
      }
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      def filesIn(sub: String): Int = {
        val p = new org.apache.hadoop.fs.Path(s"$idx/$sub/ingest=-1")
        fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
      }
      val (uniFiles, biFiles) = (filesIn("unigrams"), filesIn("bigrams"))
      val uniVocab = spark.read.parquet(s"$idx/unigrams").count()
      // range-layout pruning evidence from the REAL parquet footers: row
      // groups whose w1 [min, max] intersects ['m', 'n') — a pushed
      // w1-range predicate (PushedFilters on the scan) skips the rest
      // (filesSize can't see row-group pruning, so count footers, the
      // LayoutProbe method)
      val conf = spark.sparkContext.hadoopConfiguration
      var surviving = 0; var totalRg = 0
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/bigrams/ingest=-1"))
        .filter(_.getPath.getName.endsWith(".parquet")).foreach { f =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
          try reader.getFooter.getBlocks.forEach { block =>
            totalRg += 1
            import scala.jdk.CollectionConverters._
            val st = block.getColumns.asScala
              .find(_.getPath.toDotString == "w1").get.getStatistics
            val ok = st == null || !st.hasNonNullValue || {
              val mn = st.minAsString(); val mx = st.maxAsString()
              mn < "n" && mx >= "m"
            }
            if (ok) surviving += 1
          } finally reader.close()
        }
      println(f"[lm] vocab arm: ${uniVocab}%d distinct unigrams, build " +
        f"$buildSec%6.2f s, files uni=$uniFiles bi=$biFiles " +
        f"(was 1/1 under repartition(1)); w1-in-[m,n) survives " +
        f"$surviving%d of $totalRg%d bigram row groups")
      require(biFiles > 1, "vocab-scale bigrams must land multiple files")
      require(surviving < totalRg,
        "range layout must row-group-prune a word-bounded scan")
    }

    var factor = 1
    while (factor <= maxFactor) {
      corpusAt(factor).write.parquet(s"$root/f$factor/standing")
      val standing = spark.read.parquet(s"$root/f$factor/standing")
      val idx = s"$root/f$factor/model"
      val (buildSec, _) = ProbeHarness.time {
        LangModel.buildLmIndex(standing, idx)
      }
      val modelBytes = fs.getContentSummary(
        new org.apache.hadoop.fs.Path(idx)).getLength
      val (recomputeSec, (want, reBytes)) = ProbeHarness.time {
        val df = LangModel.ppl(standing, batch).orderBy("doc_id")
        val rows = df.collect().toSeq
        (rows, scanBytes(df))
      }
      val (probeSec, (got, prBytes)) = ProbeHarness.time {
        val df = LangModel.scoreAgainstLmIndex(idx, batch).orderBy("doc_id")
        val rows = df.collect().toSeq
        (rows, scanBytes(df))
      }
      require(got == want,
        s"index-probed scores must equal recomputed scores at ${factor}x")
      println(f"[lm] standing ${factor}x (${nBase * factor}%8d docs): " +
        f"build $buildSec%6.2f s (model ${modelBytes / 1024}%5d KB), " +
        f"recompute $recomputeSec%6.2f s (${reBytes / 1024}%8d KB read), " +
        f"probe $probeSec%6.2f s (${prBytes / 1024}%6d KB read)")
      factor *= 2
    }
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
