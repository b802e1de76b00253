package graft

import org.apache.spark.sql.SparkSession

/** Single-row repeated timing for cross-revision A/B (untracked harness). */
object MicroTime {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name, repsS) = args.take(3)
    val reps = repsS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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
      // across reps and the LATER reps die on heap, not the operator
      System.gc()
      Thread.sleep(2000)
    }
    spark.stop()
  }
}
