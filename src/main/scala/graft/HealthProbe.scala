package graft

import org.apache.spark.sql.functions._

/** Job-count evidence for the r18 `Purge.indexHealth` recast: the r17
  * form issued ONE Spark job PER partition from a driver loop
  * (`parts.map(p => spark.read.parquet(p).count())`) — at the 10⁴-batch
  * deployment the signal exists to serve, that is 10⁴ sequential job
  * submissions before one health row lands. The recast reads the index
  * root ONCE with the partition directory as a discovered column and an
  * empty projected data schema (counts served from parquet row-group
  * metadata), so the whole row costs one job regardless of partition
  * count.
  *
  * This probe builds a synthetic `ingest=<id>` layout with `nParts`
  * partitions (default 1000), runs `indexHealth` under a job-counting
  * listener, and prints jobs submitted + wall + the health row — the
  * "one job where the loop submits 10³" number the verdict asked for.
  *
  * Usage: `runMain graft.HealthProbe [nParts]` */
object HealthProbe {

  def main(args: Array[String]): Unit = {
    val nParts = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = ProbeHarness.session()
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-health-probe")
    try {
      // tiny per-partition files — the probe measures SUBMISSIONS, not scan
      val (buildSec, _) = ProbeHarness.time {
        (-1 until (nParts - 1)).foreach { id =>
          Seq(("w" + id, 1L)).toDF("w", "c")
            .coalesce(1).write.parquet(s"$root/unigrams/ingest=$id")
        }
      }
      println(f"[health] built $nParts%d partitions in $buildSec%.1f s")
      // count job SUBMISSIONS via a job group (public statusTracker API)
      spark.sparkContext.setJobGroup("health-probe", "indexHealth probe")
      val (sec, row) = ProbeHarness.time {
        graft.operators.Purge
          .indexHealth(spark, "probe", s"$root/unigrams", "ingest=",
            compactAfter = 8)
          .collect().head
      }
      val jobs = spark.sparkContext.statusTracker
        .getJobIdsForGroup("health-probe").length
      spark.sparkContext.clearJobGroup()
      println(f"[health] indexHealth over $nParts%d partitions: " +
        f"$jobs%d Spark job(s), $sec%.2f s  (r17 loop form: " +
        f"$nParts%d sequential jobs)")
      println(s"[health] row: $row")
    } finally {
      val fs = new org.apache.hadoop.fs.Path(root.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root.toString), true)
      spark.stop()
    }
  }
}
