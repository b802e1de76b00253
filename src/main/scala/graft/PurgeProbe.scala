package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the r15 takedown lifecycle: purge cost must track
  * the TOUCHED state, not the index size. Two arms on an inflated
  * corpus (`factor`× key-shifted copies of documents/embeddings):
  *
  *   BM25 — build + grow to `batches` postings partitions, then
  *   (a) LOGICAL purge of ids confined to ONE batch vs ids spanning ALL
  *       batches: both walls are one narrow postings scan + vocab merge
  *       (the subtraction basis), independent of how many partitions the
  *       ids touch;
  *   (b) compaction after each: the partition-rewrite marker lists
  *       exactly the touched partitions (printed), and the wall scales
  *       with touched bytes, not index bytes;
  *   (c) a probe after everything, against a from-scratch
  *       build-on-survivors: identical top-k (asserted).
  *
  *   IVF-PQ — build at `factor`×, purge ids landing in a FEW cells vs a
  *   from-scratch rebuild: the purge rewrites only the touched cell
  *   dirs (mtime evidence printed) and its wall sits far under the
  *   rebuild's.
  *
  * Usage: `runMain graft.PurgeProbe <sfDir> [factor] [batches]` */
object PurgeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(8)
    val batches = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensure(spark)
    import spark.implicits._

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[purgeprobe] $name%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val d0 = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val n0 = d0.count()
    // factor× corpus: key-shifted copies with salted text (distinct docs)
    val d = (0 until factor).map(k =>
        d0.select((col("doc_id") + k * 1000000L).as("doc_id"),
          concat(col("text"), lit(s" salt$k")).as("text")))
      .reduce(_ unionAll _)
      .localCheckpoint(true)
    val n = n0 * factor
    println(s"[purgeprobe] corpus: $n docs ($factor x $n0), $batches postings batches")

    // ---- BM25 arm --------------------------------------------------------
    val st = java.nio.file.Files.createTempDirectory("graft-purgeprobe")
    val idx = s"$st/bm25"
    timed(s"bm25 build+grow ($batches partitions)") {
      val per = n0 / batches
      graft.operators.Retrieval.buildBm25Index(
        d.where(col("doc_id") % 1000000 < per), idx)
      (1 until batches).foreach { b =>
        graft.operators.Retrieval.appendToBm25Index(
          d.where(col("doc_id") % 1000000 >= b.toLong * per &&
            (col("doc_id") % 1000000 < (b + 1).toLong * per || b == batches - 1)),
          idx)
      }
    }
    val terms = Seq("spark", "window", "merge")
    def topk() = graft.operators.Retrieval
      .bm25IndexedTopK(spark, idx, terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // one-batch purge: ids confined to the FIRST batch's range
    val oneBatchIds = d.where(col("doc_id") % 1000000 < 50).select(col("doc_id"))
      .localCheckpoint(true)
    // spanning purge: one id per 997 across the whole corpus
    val spanIds = d.where(col("doc_id") % 997 === 3).select(col("doc_id"))
      .localCheckpoint(true)
    println(s"[purgeprobe] one-batch ids: ${oneBatchIds.count()}, spanning ids: ${spanIds.count()}")

    timed("bm25 LOGICAL purge (one-batch ids)") {
      graft.operators.Retrieval.purgeFromBm25Index(spark, idx, oneBatchIds)
    }
    timed("bm25 compaction (touched: few)") {
      graft.operators.Retrieval.compactBm25Postings(spark, idx)
    }
    timed("bm25 LOGICAL purge (spanning ids)") {
      graft.operators.Retrieval.purgeFromBm25Index(spark, idx, spanIds)
    }
    timed("bm25 compaction (touched: all)") {
      graft.operators.Retrieval.compactBm25Postings(spark, idx)
    }
    val purgedTopk = timed("bm25 probe after purge+compact") { topk() }
    val want = s"$st/bm25want"
    timed("bm25 build-on-survivors (the rebuild a purge avoids)") {
      graft.operators.Retrieval.buildBm25Index(
        d.join(oneBatchIds.unionAll(spanIds).distinct(), Seq("doc_id"), "left_anti"),
        want)
    }
    val wantTopk = graft.operators.Retrieval
      .bm25IndexedTopK(spark, want, terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    require(purgedTopk == wantTopk,
      s"purged != rebuilt-without: $purgedTopk vs $wantTopk")
    println("[purgeprobe] bm25 purged == rebuilt-without: OK")

    // ---- IVF-PQ arm ------------------------------------------------------
    val e0 = Tables(spark, sfDir, "embeddings")
    val e = (0 until factor).map(k =>
        e0.select((col("vec_id") + k * 1000000L).as("vec_id"), col("embedding")))
      .reduce(_ unionAll _)
      .localCheckpoint(true)
    val pq = s"$st/ivfpq"
    timed("ivfpq build") {
      graft.operators.Similarity.buildIvfPqIndex(e, pq)
    }
    val cellDirs = new java.io.File(s"$pq/codes").listFiles()
      .filter(_.getName.startsWith("cell=")).sortBy(_.getName)
    val before = cellDirs.map(f => f.getName -> f.lastModified()).toMap
    // ids from ONE source vector's copies — all land in the same cell
    // (copies share the vector, cell assignment is deterministic)
    val fewCellIds = (0 until factor).map(k => k * 1000000L + 7L).toDF("vec_id")
    timed("ivfpq purge (few cells)") {
      graft.operators.Similarity.purgeFromIvfPqIndex(spark, pq, fewCellIds)
    }
    val touched = new java.io.File(s"$pq/codes").listFiles()
      .filter(_.getName.startsWith("cell="))
      .filter(f => before.get(f.getName).forall(_ != f.lastModified()))
      .map(_.getName).sorted
    println(s"[purgeprobe] ivfpq cells touched by purge: ${touched.mkString(",")} " +
      s"of ${cellDirs.length}")
    timed("ivfpq rebuild (the alternative)") {
      graft.operators.Similarity.buildIvfPqIndex(
        e.join(fewCellIds, Seq("vec_id"), "left_anti"), s"$st/ivfpqwant")
    }
    def rm(p: java.nio.file.Path): Unit = {
      def walk(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(walk)); f.delete(); ()
      }
      walk(p.toFile)
    }
    rm(st)
    spark.stop()
  }
}
