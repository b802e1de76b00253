package graft

import org.apache.spark.sql.functions._

/** Per-batch economics of the r19 [[graft.operators.LangModel.LmSession]]
  * vs the r18 per-batch dir-based model read, on the lang-keyed layout
  * the LM streaming loops serve. Two arms over IDENTICAL batch slices,
  * each against its own identically-seeded `tok=ml` layout (appends
  * mutate, so the arms can't share one):
  *
  *   - dir arm — the r18 loop body: `scoreAgainstLmMlIndex` +
  *     `appendToLmIndex` per batch, i.e. the model re-listed,
  *     re-repaired and re-folded from parquet once per micro-batch;
  *   - session arm — the r19 loop body: one `openLmSession` per run,
  *     `score` + `append` per batch (cache rolled forward in memory).
  *
  * The claim under test: the session arm's per-batch wall stays FLAT as
  * batches accumulate and sheds the per-batch parquet re-read + repair
  * pass; the scores are row-identical by SessionSpec, so this probe only
  * times. Run twice — round 1 carries JIT/codegen warmup; read round 2.
  *
  * Usage: `runMain graft.LmSessionProbe <sfDir> [batches] [rounds] [order]`
  * — order 5 builds the five-table layout, where the dir arm's per-batch
  * re-read is 5 tables + repair instead of 2 (the r18 verdict's "tax
  * grows with model order"). */
object LmSessionProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LmSessionProbe <sfDir> [batches] [rounds]")
    val dir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 6
    val rounds = if (args.length > 2) args(2).toInt else 2
    val order = if (args.length > 3) args(3).toInt else 2
    require(nBatches >= 1 && nBatches <= 40, s"batches $nBatches out of range")
    require(order == 2 || order == 5, s"order $order: probe arms exist for 2 and 5")
    val spark = ProbeHarness.session()
    import graft.operators.LangModel
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val bkt = graft.operators.Sampling.hashBucket(col("doc_id"), 100)
    val seed = d.where(bkt >= 50)
    def mkBatch(k: Int) = d.where(bkt === k)
    def time[T](body: => T): Double = {
      val s = System.nanoTime(); body; (System.nanoTime() - s) / 1e9
    }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(" ")
    seed.limit(1).write.format("noop").mode("overwrite").save() // warm JIT
    (1 to rounds).foreach { r =>
      val root = s"/tmp/graft-lmsessionprobe/r$r"
      def build(to: String): Unit =
        if (order == 5) LangModel.buildLmMl5Index(seed, to)
        else LangModel.buildLmMlIndex(seed, to)
      def scoreDir(path: String, b: org.apache.spark.sql.DataFrame, k: Long) =
        if (order == 5) LangModel.scoreAgainstLmNIndex(path, b, 5, ml = true,
          excludeIngestBatch = Some(k))
        else LangModel.scoreAgainstLmMlIndex(path, b, excludeIngestBatch = Some(k))
      // dir arm (the r18 loop body)
      build(s"$root/dir")
      val dirT = (0 until nBatches).map { k =>
        val b = mkBatch(k).persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        b.count()
        val sec = time {
          scoreDir(s"$root/dir", b, k.toLong)
            .write.format("noop").mode("overwrite").save()
          LangModel.appendToLmIndex(b, s"$root/dir", k.toLong)
        }
        b.unpersist(false)
        sec
      }
      // session arm (the r19 loop body; batch 0 includes no cache load —
      // the fold happens at open, timed separately)
      build(s"$root/sess")
      val openSec = time { () }
      val t0 = System.nanoTime()
      val sess = LangModel.openLmSession(spark, s"$root/sess")
      val openWall = (System.nanoTime() - t0) / 1e9 + openSec
      val sesT = (0 until nBatches).map { k =>
        val b = mkBatch(k).persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        b.count()
        val sec = time {
          sess.score(b, excludeIngestBatch = Some(k.toLong))
            .write.format("noop").mode("overwrite").save()
          sess.append(b, k.toLong)
        }
        b.unpersist(false)
        sec
      }
      sess.close()
      println(f"[lmsession] round $r order=$order open: $openWall%.2f s  " +
        s"dir/batch: ${fmt(dirT)}  session/batch: ${fmt(sesT)}")
    }
    spark.stop()
  }
}
