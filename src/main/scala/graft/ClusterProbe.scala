package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** A/Bs incremental cluster maintenance against the full recompute it
  * replaces, on one corpus in one session: `incrementalClusters(labels0,
  * newPairs)` vs `connectedComponents(pairs0 ∪ newPairs)`. Both arms get
  * the SAME precomputed-and-persisted standing inputs (the corpus pair
  * set and its labeling) so the timed delta isolates the clustering
  * increment — the LSH side of the increment is CrossProbe's question,
  * not this probe's.
  *
  * Timing discipline: result-identity asserted first (the incremental-
  * equals-full theorem, on real corpus pairs), both arms warmed, then
  * timed INTERLEAVED over `rounds` rounds (the `MinhashProbe` shape).
  *
  * Usage: runMain graft.ClusterProbe <sfDir> [rounds] [batchPct]
  * (point sfDir at a ScaleGen scale-docs output for the 10× corpus)
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ClusterProbe <sfDir> [rounds] [batchPct]")
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val batchPct = if (args.length > 2) args(2).toInt else 2
    val spark = ProbeHarness.session()
    import ProbeHarness.time
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    try {
      val corpus = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
      val batch = ProbeHarness.syntheticBatch(corpus, batchPct)
      // Standing state, shared by both arms, built once outside timing:
      // the corpus candidate-pair set and its labeling.
      val pairs0 = Dedup.lshCandidatePairsDedup(corpus)
        .persist(sl)
      val labels0 = Dedup.connectedComponents(pairs0).persist(sl)
      val newPairs = Dedup.crossNearDup(corpus, batch, threshold = 0.0)
        .select(col("batch_id").as("doc_a"), col("corpus_id").as("doc_b"))
        .persist(sl)
      println(s"[clusterprobe] corpus=${corpus.count()} docs, " +
        s"pairs0=${pairs0.count()}, labels0=${labels0.count()}, " +
        s"newPairs=${newPairs.count()}")

      def incremental() = Dedup.incrementalClusters(labels0, newPairs)
      def full() = Dedup.connectedComponents(pairs0.unionAll(newPairs))
      val a = incremental(); val b = full()
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "incremental labeling disagrees with the full recompute")
      println(s"[clusterprobe] arms agree: ${a.count()} labeled nodes")
      for (r <- 1 to rounds) {
        val (ti, ni) = time(incremental().count())
        val (tf, nf) = time(full().count())
        assert(ni == nf)
        println(f"[clusterprobe] round $r: incremental $ti%.2f s  full $tf%.2f s")
      }
    } finally spark.stop()
  }
}
