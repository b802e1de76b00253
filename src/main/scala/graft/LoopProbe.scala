package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage attribution of the streaming curation loop's micro-batch
  * body (VERDICT r14 #5 / r15 #3: dd_curation_stream & friends spend
  * their wall in the loop; this probe says WHERE inside a batch, and A/Bs
  * the r16 FUSED scorer session against the unfused pair it replaced).
  * Rounds alternate UNFUSED (crossNearDupIndexed + nearDupScores +
  * appendToCrossNearDupIndex, each with its own shingle chain and a
  * per-batch standing-parquet re-read) and FUSED
  * (Dedup.CrossIndexSession.scoreBatch/append: one shared batch chain,
  * standing bucket side cached across batches). Each fused round scores
  * TWO batches on one session — the first pays the cold cache load, the
  * second shows the warm steady state a long-running loop lives in.
  * The job-count listener is the overhead currency at micro-batch scale
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
    def mkBatch(shift: Long) = d.where(col("doc_id") < 10)
      .select((col("doc_id") + shift).as("doc_id"),
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
    spark.conf.set("graft.eagerRelease", "true")

    def guards(b: org.apache.spark.sql.DataFrame): Unit = {
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
    }
    val labels = spark.read.schema("doc_id LONG, cluster_id LONG")
      .parquet(s"$lblDir/v-1")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    // each round consumes two fresh id ranges so the index grows but ids
    // never collide; fused and unfused rounds interleave for A/B fairness
    var shift = 1000L
    def nextShift(): Long = { val s = shift; shift += 1000L; s }

    (1 to 8).foreach { round =>
      val fused = round % 2 == 0
      val mode = if (fused) "FUSED" else "unfused"
      println(s"[loopprobe] ---- round $round ($mode; 2 batches x 10 docs) ----")
      val jAll = jobs.get()
      val tAll = System.nanoTime()
      if (!fused) {
        (1 to 2).foreach { k =>
          val b = mkBatch(nextShift()).persist(sl)
          guards(b)
          val cross = stage(s"score:cross-indexed b$k") {
            graft.operators.Dedup.crossNearDupIndexed(spark, idxDir, b, 0.8)
              .select(col("batch_id").as("doc_a"), col("corpus_id").as("doc_b"))
          }
          val within = stage(s"score:within-batch b$k") {
            graft.operators.Dedup.nearDupScores(b)
              .where(col("jaccard") >= 0.8)
              .select(col("doc_a"), col("doc_b"))
          }
          val edges = stage(s"edges:union-ckpt b$k") {
            cross.unionAll(within).localCheckpoint(true)
          }
          stage(s"fold:incrementalClusters b$k") {
            graft.operators.Dedup.incrementalClusters(labels, edges)
              .write.mode("overwrite").parquet(s"$lblDir/vprobe$round-$k")
          }
          stage(s"write:index-append b$k") {
            graft.operators.Dedup.appendToCrossNearDupIndex(b, idxDir)
          }
          b.unpersist(false)
        }
      } else {
        val scorer = graft.operators.Dedup.openCrossIndexSession(spark, idxDir)
        (1 to 2).foreach { k =>
          val b = mkBatch(nextShift()).persist(sl)
          guards(b)
          val score = stage(s"score:fused b$k (${if (k == 1) "cold" else "warm"})") {
            scorer.scoreBatch(b, 0.8)
          }
          stage(s"fold:incrementalClusters b$k") {
            graft.operators.Dedup.incrementalClusters(labels, score.edges)
              .write.mode("overwrite").parquet(s"$lblDir/vprobe$round-$k")
          }
          stage(s"write:index-append b$k") {
            scorer.append(score)
          }
          b.unpersist(false)
        }
        scorer.close()
      }
      println(f"[loopprobe] TOTAL round ($mode%s)      ${(System.nanoTime() - tAll) / 1e9}%7.3f s  jobs=${jobs.get() - jAll}")
    }
    spark.stop()
  }
}
