package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage attribution of the streaming curation loop's micro-batch
  * body (VERDICT r14 #5: dd_curation_stream / cur_novelty_stream spend
  * their wall in the loop; this probe says WHERE inside a batch).
  * Replays the dd_curation_stream fixture, then runs one batch's stages
  * inline with per-stage wall timers and a job-count listener — the
  * number of Spark jobs is the overhead currency at micro-batch scale
  * (tiny data ⇒ scheduling + per-stage fixed cost dominate).
  *
  * Usage: `runMain graft.LoopProbe <sfDir>` */
object LoopProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensure(spark)

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })

    val d = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val corpus = d.where(col("doc_id") < 40)
    val b1 = d.where(col("doc_id") < 10)
      .select((col("doc_id") + 1000).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text"))

    val st = java.nio.file.Files.createTempDirectory("graft-loopprobe")
    val (idxDir, lblDir) = (s"$st/index", s"$st/labels")
    graft.streaming.Streams.seedCurationState(corpus, idxDir, lblDir, 0.8)

    def stage[T](name: String)(body: => T): T = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[loopprobe] $name%-28s ${sec}%7.3f s  jobs=${jobs.get() - j0}")
      r
    }

    // warm the session (JIT, codegen, committers) with one throwaway pass
    corpus.write.format("noop").mode("overwrite").save()

    // rounds alternate (eager, lazy) materialization of the scorer
    // chains; shuffle partitions stay at the session default — AQE
    // already coalesces tiny shuffles, measured no-op in the real rows
    val eagerByRound = Map(1 -> true, 2 -> false, 3 -> true, 4 -> false,
      5 -> true, 6 -> false, 7 -> true, 8 -> false)
    (1 to 8).foreach { round =>
      spark.conf.set("graft.eagerRelease", eagerByRound(round).toString)
      println(s"[loopprobe] ---- round $round (batch = 10 docs, eagerRelease=${eagerByRound(round)}) ----")
      val jAll = jobs.get()
      val tAll = System.nanoTime()
      val b = b1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      stage("guard:dup-in-batch") {
        b.groupBy(col("doc_id")).agg(count(lit(1)).as("k"))
          .where(col("k") > 1).limit(1).collect()
      }
      stage("guard:index-collision") {
        spark.read.schema("doc_id LONG, sk LONG")
          .parquet(s"$idxDir/shingle_keys").select(col("doc_id"))
          .join(broadcast(b.select(col("doc_id"))), Seq("doc_id"), "left_semi")
          .limit(1).collect()
      }
      val labels = spark.read.schema("doc_id LONG, cluster_id LONG")
        .parquet(s"$lblDir/v-1")
      // scorers exactly as curationLoop consumes them (no extra
      // checkpoint): under eagerRelease=true the operators materialize
      // internally; under false the fold stage pays the lazy compute
      val cross = stage("score:cross-indexed") {
        graft.operators.Dedup.crossNearDupIndexed(spark, idxDir, b, 0.8)
          .select(col("batch_id").as("doc_a"), col("corpus_id").as("doc_b"))
      }
      val within = stage("score:within-batch") {
        graft.operators.Dedup.nearDupScores(b)
          .where(col("jaccard") >= 0.8)
          .select(col("doc_a"), col("doc_b"))
      }
      val folded = stage("fold:incrementalClusters") {
        graft.operators.Dedup.incrementalClusters(labels, cross.unionAll(within))
      }
      stage("write:labels-snapshot") {
        folded.write.mode("overwrite").parquet(s"$lblDir/vprobe$round")
      }
      stage("write:index-append") {
        graft.operators.Dedup.appendToCrossNearDupIndex(
          b.select(col("doc_id") + lit(round * 100000), col("text"))
            .toDF("doc_id", "text"), idxDir)
      }
      b.unpersist(false)
      println(f"[loopprobe] TOTAL batch              ${(System.nanoTime() - tAll) / 1e9}%7.3f s  jobs=${jobs.get() - jAll}")
    }
    spark.stop()
  }
}
