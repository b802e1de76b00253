package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-job wall-time profile of a declared query:
  * `sbt "runMain graft.Profile <sfDir> <query>"`.
  *
  * Runs the query once warm (codegen/JIT/page cache), clears caches, then
  * times a second run with a listener attributing wall time to each Spark
  * job. The gap between the job-time SUM and the wall TOTAL is driver-side
  * planning + scheduling idle — on a many-short-stage operator chain that
  * gap IS the optimization target (collapse stages, not kernels).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Profile <sfDir> <query> [cpus]")
    val (dir, name) = (args(0), args(1))
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Both maps are mutated from the listener-bus thread AND cleared from
    // the main thread between runs — every access holds the same `done`
    // monitor (mutable.Map is not safe under concurrent structural change,
    // and a listener-thread exception would be swallowed by the bus,
    // silently losing timings).
    val starts = mutable.Map[Int, (Long, String)]()
    val done = mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // The result stage's name (callSite short form) + stage count — the
        // most identifying label available without the SQL UI.
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        done.synchronized {
          starts(j.jobId) = (System.nanoTime(), s"${j.stageInfos.size} stages; $site")
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        done.synchronized {
          starts.remove(j.jobId).foreach { case (t0, site) =>
            done += ((j.jobId, (System.nanoTime() - t0) / 1e9, site))
          }
        }
    })
    Tables.names.foreach(t => Tables(spark, dir, t).count())
    val q = SparkEntry.queries(name)
    q(spark, dir).write.format("noop").mode("overwrite").save() // warm
    spark.catalog.clearCache(); System.gc()
    Thread.sleep(200) // let listener events drain before clearing
    // Clear in-flight starts too: a warm-run job whose end event lands
    // after the drain window would otherwise be attributed to the measured
    // profile with its warm-run duration included.
    done.synchronized { done.clear(); starts.clear() }
    val t0 = System.nanoTime()
    q(spark, dir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // listener events are async; let the bus drain
    val jobs = done.synchronized(done.toVector)
    println(f"[profile] $name TOTAL $total%.2f s over ${jobs.size} jobs; " +
      f"SUM(jobs) ${jobs.map(_._2).sum}%.2f s " +
      "(SUM < TOTAL: driver planning/idle gap; SUM > TOTAL: concurrent jobs)")
    jobs.sortBy(-_._2).take(30).foreach { case (id, s, site) =>
      println(f"[profile]   job $id%3d  $s%6.2f s  $site")
    }
    spark.stop()
  }
}
