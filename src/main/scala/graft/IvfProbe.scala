package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Demonstrates `buildIvfIndex`'s partition pruning at scale (the claim's
  * spec lock is SimilaritySpec's PartitionFilters assertion on toy data):
  * builds the cell-partitioned layout over the full embeddings table, runs
  * the indexed probe and the brute scan, and reports the FILES and BYTES
  * each scan actually opened (FileSourceScanExec metrics) plus wall time —
  * the nProbe/nCells fraction is the 100 TB argument made observable.
  *
  * Usage: runMain graft.IvfProbe <sfDir> [nCells] [nProbe]
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfProbe <sfDir> [nCells] [nProbe]")
    val dir = args(0)
    val nCells = if (args.length > 1) args(1).toInt else 16
    val nProbe = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, dir, "embeddings")
    val q = e.where(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .head().getSeq[Double](0)
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-probe").toString
    val tb = System.nanoTime()
    Similarity.buildIvfIndex(e, idx, nCells)
    val buildSec = (System.nanoTime() - tb) / 1e9

    def scanStats(df: org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val scans = df.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s }
      // fail loudly, never report files=0/bytes=0 as "perfect pruning": a
      // plan whose scans hide behind an AQE wrapper or exchange would
      // otherwise silently corrupt the probe's headline evidence
      assert(scans.nonEmpty,
        "no FileSourceScanExec leaf found — plan shape changed, metrics invalid:\n" +
          df.queryExecution.executedPlan.toString.take(2000))
      val files = scans.map(s => s.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
      val bytes = scans.map(s => s.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum
      (sec, files, bytes)
    }
    val (bSec, bFiles, bBytes) = scanStats(Similarity.bruteForceTopK(e, q, 10))
    val (iSec, iFiles, iBytes) =
      scanStats(Similarity.ivfTopKIndexed(spark, idx, q, 10, nProbe))
    println(f"[ivfprobe] vectors=${e.count()}%d nCells=$nCells%d nProbe=$nProbe%d build=$buildSec%.1f s")
    println(f"[ivfprobe] brute:   $bSec%.2f s, files=$bFiles%d, bytes=$bBytes%d")
    println(f"[ivfprobe] indexed: $iSec%.2f s, files=$iFiles%d, bytes=$iBytes%d " +
      f"(${100.0 * iBytes / math.max(1, bBytes)}%.0f%% of brute bytes)")
    spark.stop()
  }
}
