package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** A/Bs the two forms of cross-corpus near-dedup on one corpus in one
  * session: `crossNearDup` (corpus LSH chain recomputed per call) vs
  * `crossNearDupIndexed` (corpus side loaded from a prebuilt
  * `buildCrossNearDupIndex` layout). The index-build cost is reported
  * separately — it amortizes across every subsequent batch, which is the
  * claim EXPLAIN.md makes and this probe prices.
  *
  * Timing discipline: result-identity asserted first, both arms warmed
  * once, then timed INTERLEAVED over `rounds` rounds (the `MinhashProbe`
  * shape — one-shot sub-2 s deltas on this host flip direction
  * run-to-run and are never attributed).
  *
  * Usage: runMain graft.CrossProbe <sfDir> [rounds] [batchPct]
  * (point sfDir at a ScaleGen scale-docs output for the 10× corpus)
  */
object CrossProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CrossProbe <sfDir> [rounds] [batchPct]")
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val batchPct = if (args.length > 2) args(2).toInt else 2
    val spark = ProbeHarness.session()
    import ProbeHarness.time
    try {
      val corpus = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
      val batch = ProbeHarness.syntheticBatch(corpus, batchPct)
      println(s"[crossprobe] corpus=${corpus.count()} batch=${batch.count()} docs")

      val idxDir = java.nio.file.Files.createTempDirectory("graft-crossprobe-idx").toString
      val (tBuild, _) = time(Dedup.buildCrossNearDupIndex(corpus, idxDir))
      println(f"[crossprobe] index build: $tBuild%.2f s (one-time, amortizes over batches)")

      // materializeThenRelease makes both calls eager — time the call+count
      // as one unit. Result identity first: a fast-but-wrong arm is not an
      // optimization.
      def recompute() = Dedup.crossNearDup(corpus, batch, threshold = 0.5)
      def indexed() = Dedup.crossNearDupIndexed(spark, idxDir, batch, threshold = 0.5)
      val a = recompute(); val b = indexed()
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "indexed probe disagrees with recompute form")
      println(s"[crossprobe] arms agree: ${a.count()} match pairs")
      for (r <- 1 to rounds) {
        val (tr, nr) = time(recompute().count())
        val (ti, ni) = time(indexed().count())
        assert(nr == ni)
        println(f"[crossprobe] round $r: recompute $tr%.2f s  indexed $ti%.2f s")
      }
    } finally spark.stop()
  }
}
