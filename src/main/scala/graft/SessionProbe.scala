package graft

import org.apache.spark.sql.functions._

/** Per-batch PROBE economics of the r16 `Dedup.CrossIndexSession` as the
  * standing index grows (the claim under test: the session moves the
  * loop's standing-state-scale per-batch work — bucket parquet re-read +
  * capBuckets' full-union aggregate + manifest re-inference — into one
  * session-init load, so per-batch cost stops scaling with corpus size).
  *
  * Builds ONE persisted cross-near-dup index over a `inflate`×
  * TRUE-distinct corpus (CapProbe's copy-specific ASCII salting — salted
  * copies are NOT near-dups, so candidate work stays batch-confined and
  * the arms measure standing-side overhead, not a candidate explosion),
  * then scores the same `batches` micro-batches through both arms,
  * interleaved per round:
  *   - unfused: `crossNearDupIndexed` + thresholded `nearDupScores` +
  *     union checkpoint — the r15 loop body minus the append;
  *   - fused:   `CrossIndexSession.scoreBatch` (fresh session per round —
  *     batch 1 carries the cache load; later batches show steady state).
  * Neither arm appends, so the index is identical for every measurement.
  *
  * Usage: `runMain graft.SessionProbe <sfDir> [inflate] [batches] [rounds]` */
object SessionProbe {

  private def salt(i: Int): String = {
    val a = (33 to 126).filter(c => c != '$' && c != '\\').map(_.toChar)
    s"${a(i / a.length)}${a(i % a.length)}"
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SessionProbe <sfDir> [inflate] [batches] [rounds]")
    val dir = args(0)
    val inflate = if (args.length > 1) args(1).toInt else 8
    val nBatches = if (args.length > 2) args(2).toInt else 3
    val rounds = if (args.length > 3) args(3).toInt else 2
    require(inflate >= 1 && inflate <= 200, s"inflate $inflate out of range")
    val spark = ProbeHarness.session()
    import graft.operators.Dedup

    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val nBase = base.count()
    val corpus = (0 until inflate).map { i =>
      base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(........)", "$1" + salt(i)).as("text"))
    }.reduce(_ unionAll _)
    val idx = "/tmp/graft-sessionprobe/index"
    val t0 = System.nanoTime()
    Dedup.buildCrossNearDupIndex(corpus, idx)
    println(f"[sessionprobe] index build: ${nBase * inflate} docs, " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    // batches: near-dups of copy-0 docs (real candidate work, tiny sets)
    def mkBatch(k: Int) = base
      .where(col("doc_id") >= k * 20 && col("doc_id") < (k + 1) * 20)
      .select((col("doc_id") + 1000000000L + k * 1000L).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text"))
    val threshold = 0.8
    corpus.limit(1).write.format("noop").mode("overwrite").save() // warm JIT

    def time[T](body: => T): Double = {
      val s = System.nanoTime(); body; (System.nanoTime() - s) / 1e9
    }
    (1 to rounds).foreach { r =>
      // unfused arm
      val un = (0 until nBatches).map { k =>
        val b = mkBatch(k).persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sec = time {
          val cross = Dedup.crossNearDupIndexed(spark, idx, b, threshold)
            .select(col("batch_id").as("doc_a"), col("corpus_id").as("doc_b"))
          val within = Dedup.nearDupScores(b)
            .where(col("jaccard") >= threshold)
            .select(col("doc_a"), col("doc_b"))
          cross.unionAll(within).localCheckpoint(true).count()
        }
        b.unpersist(false)
        sec
      }
      // fused arm (fresh session: batch 0 pays the cache load)
      val session = Dedup.openCrossIndexSession(spark, idx)
      val fu = (0 until nBatches).map { k =>
        val b = mkBatch(k).persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sec = time { session.scoreBatch(b, threshold).edges.count() }
        b.unpersist(false)
        sec
      }
      session.close()
      def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(" ")
      println(s"[sessionprobe] round $r inflate=$inflate  unfused/batch: ${fmt(un)}" +
        s"  fused/batch: ${fmt(fu)} (first carries cache load)")
    }
    spark.stop()
  }
}
