package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the r16 append-side compaction verbs: long-running
  * streaming ingest accumulates one partition per micro-batch, so probe
  * cost grows with STREAM LIFETIME instead of data size — the fold must
  * restore O(1) partitions with bit-identical probe output and a
  * measurably cheaper probe. Two arms, both grown to `batches`
  * partitions on a `factor`×-inflated corpus:
  *
  *   BM25 — build, grow batch-by-batch, time the indexed top-k probe on
  *   the fragmented index, fold (`compactBm25Batches`), re-time the
  *   identical probe. Printed: postings dir count before/after, parquet
  *   file count before/after, probe walls, and a result-identity assert.
  *
  *   exact-window — same cadence with `compactExactWindowIndex`, plus
  *   the stored-row collapse (cross-batch duplicate keys fold away).
  *
  * Usage: `runMain graft.CompactProbe <sfDir> [factor] [batches]` */
object CompactProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(4)
    val batches = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = ProbeHarness.session()
    graft.functions.GraftFunctions.ensure(spark)
    import spark.implicits._

    def timed[T](name: String)(body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[compactprobe] $name%-52s $sec%8.2f s")
      (sec, r)
    }
    def dirCount(path: String, prefix: String): Int =
      Option(new java.io.File(path).listFiles()).toSeq.flatten
        .count(_.getName.startsWith(prefix))
    def fileCount(path: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(new java.io.File(path))
    }

    val d0 = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val n0 = d0.count()
    val d = (0 until factor).map(k =>
        d0.select((col("doc_id") + k * 1000000L).as("doc_id"),
          concat(col("text"), lit(s" salt$k")).as("text")))
      .reduce(_ unionAll _)
      .localCheckpoint(true)
    val n = n0 * factor
    println(s"[compactprobe] corpus: $n docs ($factor x $n0), $batches ingest batches")

    // ---- BM25 arm --------------------------------------------------------
    val bmDir = java.nio.file.Files.createTempDirectory("graft-cprobe-bm25").toString
    // slice the BASE id space (the k-copies shift by 1e6): every batch
    // carries its base-id slice from all `factor` copies
    val baseId = col("doc_id") % 1000000L
    val slice = math.max(1L, n0 / (batches + 1))
    def sliceRange(b: Int): org.apache.spark.sql.Column = {
      val lo = slice * (b + 1)
      if (b == batches - 1) baseId >= lit(lo)
      else baseId >= lit(lo) && baseId < lit(slice * (b + 2))
    }
    timed(s"bm25 build (base slice, $slice base ids x $factor)") {
      graft.operators.Retrieval.buildBm25Index(
        d.where(baseId < lit(slice)), s"$bmDir/i")
    }
    val (growSec, _) = timed(s"bm25 grow x$batches (streaming-id appends)") {
      (0 until batches).foreach { b =>
        graft.operators.Retrieval.appendToBm25Index(
          d.where(sliceRange(b)), s"$bmDir/i",
          batchId = Some(b.toLong), files = 2)
      }
    }
    val terms = Seq("spark", "window", "merge")
    def bmProbe() = graft.operators.Retrieval
      .bm25IndexedTopK(spark, s"$bmDir/i", terms, 20)
      .as[(Long, Double)].collect().toSeq
    // warm once (JIT/committer), then measure
    bmProbe()
    val (probeFragSec, fragRes) = timed("bm25 indexed probe, FRAGMENTED") { bmProbe() }
    val dirsBefore = dirCount(s"$bmDir/i/postings", "batch=")
    val filesBefore = fileCount(s"$bmDir/i/postings")
    val (foldSec, _) = timed("bm25 fold (compactBm25Batches)") {
      graft.operators.Retrieval.compactBm25Batches(spark, s"$bmDir/i")
    }
    val dirsAfter = dirCount(s"$bmDir/i/postings", "batch=")
    val filesAfter = fileCount(s"$bmDir/i/postings")
    bmProbe()
    val (probeFoldSec, foldRes) = timed("bm25 indexed probe, FOLDED") { bmProbe() }
    require(fragRes == foldRes,
      "folded BM25 probe must return bit-identical top-k")
    println(s"[compactprobe] bm25 partitions: $dirsBefore -> $dirsAfter; " +
      s"parquet files: $filesBefore -> $filesAfter; " +
      f"probe $probeFragSec%.2f -> $probeFoldSec%.2f s (grow $growSec%.1f, fold $foldSec%.1f)")

    // ---- exact-window arm -------------------------------------------------
    val wDir = java.nio.file.Files.createTempDirectory("graft-cprobe-win").toString
    timed("window build (base slice)") {
      graft.operators.Dedup.buildExactWindowIndex(
        d.where(baseId < lit(slice)), s"$wDir/i")
    }
    timed(s"window grow x$batches") {
      (0 until batches).foreach { b =>
        graft.operators.Dedup.appendToExactWindowIndex(
          d.where(sliceRange(b)), s"$wDir/i", ingestBatch = b.toLong)
      }
    }
    val batch = d0.where(col("doc_id") < 50)
      .select((col("doc_id") + 900000000L).as("doc_id"),
        concat(lit("lead words "), substring(col("text"), 3, 150),
          lit(" tail words")).as("text"))
      .localCheckpoint(true)
    def wProbe() = graft.operators.Dedup
      .exactCrossDupIndexed(spark, s"$wDir/i", batch)
      .select(col("doc_id"), col("span_start").cast("long"),
        col("span_end").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    wProbe()
    val (wFragSec, wFragRes) = timed("window indexed probe, FRAGMENTED") { wProbe() }
    val wRowsBefore = spark.read.parquet(s"$wDir/i/windows").count()
    val wFilesBefore = fileCount(s"$wDir/i/windows")
    val (wFoldSec, _) = timed("window fold (compactExactWindowIndex)") {
      graft.operators.Dedup.compactExactWindowIndex(spark, s"$wDir/i")
    }
    val wRowsAfter = spark.read.parquet(s"$wDir/i/windows").count()
    val wFilesAfter = fileCount(s"$wDir/i/windows")
    wProbe()
    val (wFoldProbeSec, wFoldRes) = timed("window indexed probe, FOLDED") { wProbe() }
    require(wFragRes == wFoldRes,
      "folded window probe must return bit-identical spans")
    println(s"[compactprobe] window partitions: ${batches + 1} -> 1; " +
      s"stored keys: $wRowsBefore -> $wRowsAfter; files: $wFilesBefore -> $wFilesAfter; " +
      f"probe $wFragSec%.2f -> $wFoldProbeSec%.2f s (fold $wFoldSec%.1f)")

    spark.stop()
  }
}
