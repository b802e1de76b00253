package graft

import org.apache.spark.sql.SparkSession

/** Single-row repeated timing for cross-revision A/B (untracked harness). */
object MicroTime {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name, repsS) = args.take(3)
    val reps = repsS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional AQE-widening A/B knobs (scale probes): start shuffles at
    // INIT_PARTS partitions and let AQE coalesce back by ADVISORY bytes —
    // per-task aggregate state shrinks at big inputs while small inputs
    // coalesce to few tasks. Unset = the session defaults the bench uses.
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val b1 = sys.env.get("SPARK_GRAFT_INIT_PARTS").fold(b0)(v =>
      b0.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", v))
    val spark = sys.env.get("SPARK_GRAFT_ADVISORY").fold(b1)(v =>
      b1.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", v))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[micro] $name rep$i%d ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      // reclaim the rep's checkpoint blocks before the next rep starts:
      // ContextCleaner frees dropped RDDs from a weak-ref queue, which
      // only fills on GC — without this, big-state rows stack blocks
      // across reps and the LATER reps die on heap, not the operator.
      // TWO gc+settle cycles: the cleaner drains its queue asynchronously
      // after the first GC, and the second GC collects what the drain
      // itself just unpinned (one cycle left 10×-scale rows' blocks
      // alive into the next rep — measured this round: rep1 green at
      // 8 g, rep2 heap-OOM on stacked blocks).
      (1 to 2).foreach { _ => System.gc(); Thread.sleep(2500) }
    }
    spark.stop()
  }
}
