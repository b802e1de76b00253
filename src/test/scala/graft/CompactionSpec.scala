package graft

import graft.operators.{Curation, Dedup, Multimodal, Purge, Retrieval}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The append-side COMPACTION lifecycle (r16): every batchId-keyed index
  * family folds its accumulated micro-batch partitions into one base with
  * bit-identical probe results, crash-safe at every window — the verb
  * long-running streaming ingest needs once partition count becomes the
  * probe cost ([[graft.operators.Layout.compactKeyed]] proved the shape;
  * these are its siblings on the other families). */
class CompactionSpec extends TestBase {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit = {
    def walk(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(walk))
      f.delete(); ()
    }
    walk(new java.io.File(dir))
  }

  private def partCount(dir: String, prefix: String): Int =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .count(_.getName.startsWith(prefix))

  // ---- signature index (dHash/audio shared layout) ----------------------

  test("sig-index compaction: fold == grown probes; crash windows converge; idempotent") {
    val media = Multimodal.syntheticImageVariants(
      (0L until 12L).map(i => (i, i, 0, 0)).toDF("doc_id", "key", "delta", "spot"))
    val batch = Multimodal.syntheticImageVariants(
      (0L until 6L).map(i => (i + 100L, i, 1, 0)).toDF("doc_id", "key", "delta", "spot"))
    val idx = tmp("graft-sig-compact")
    import org.apache.spark.sql.Dataset
    def slice(lo: Long, hi: Long): Dataset[graft.operators.MediaRow] =
      media.filter(col("doc_id") >= lo && col("doc_id") < hi)
    Multimodal.buildDHashIndex(slice(0, 4), idx)
    Multimodal.appendToDHashIndex(slice(4, 8), idx, ingestBatch = 0L)
    Multimodal.appendToDHashIndex(slice(8, 12), idx, ingestBatch = 1L)
    def probe() = Multimodal.crossNearDupImagesIndexed(spark, idx, batch)
      .select(col("batch_id"), col("corpus_id"), col("hamming").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val grown = probe()
    assert(grown.nonEmpty, "fixture must produce cross matches")
    assert(partCount(s"$idx/hashes", "ingest_batch=") == 3)

    // crash window A: a half-written stage from a dead compactor — the
    // fold's own repair discards it and the fold completes
    Seq((999L, 0L)).toDF("doc_id", "phash").write
      .parquet(s"$idx/hashes/_graft_purging/ingest_batch=-1")
    Multimodal.compactDHashIndex(spark, idx)
    assert(partCount(s"$idx/hashes", "ingest_batch=") == 1,
      "fold must collapse to the single base partition")
    assert(probe() == grown, "folded index must probe bit-identically")
    // no phantom rows from the discarded stage
    assert(Multimodal.standingDHashes(spark, idx)
      .where(col("doc_id") === 999L).count() == 0)

    // idempotent: compacting a compacted index is a no-op
    Multimodal.compactDHashIndex(spark, idx)
    assert(partCount(s"$idx/hashes", "ingest_batch=") == 1)
    assert(probe() == grown)

    // re-grow after a fold, fold again: the base id (-1) is reused, so
    // the fold cadence composes indefinitely (the marker-committed crash
    // window itself is the generic 2pc machinery PurgeSpec pins)
    Multimodal.appendToDHashIndex(slice(4, 8).select(
        (col("doc_id") + 50).as("doc_id"), col("mime"), col("content"))
      .as[graft.operators.MediaRow], idx, ingestBatch = 7L)
    val before = probe()
    Multimodal.compactDHashIndex(spark, idx)
    assert(partCount(s"$idx/hashes", "ingest_batch=") == 1)
    assert(probe() == before)
    rm(idx)
  }

  // ---- exact-window index ------------------------------------------------

  test("exact-window compaction: fold dedups keys, probes identical, manifest intact") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val idx = tmp("graft-win-compact")
    Dedup.buildExactWindowIndex(d.where(col("doc_id") < 20), idx)
    Dedup.appendToExactWindowIndex(
      d.where(col("doc_id") >= 20 && col("doc_id") < 35), idx)
    // overlapping content: re-append docs 10..20 under the batch API —
    // duplicate window keys across partitions that the fold must collapse
    Dedup.appendToExactWindowIndex(
      d.where(col("doc_id") >= 10 && col("doc_id") < 20), idx)
    val batch = d.where(col("doc_id") < 5)
      .select((col("doc_id") + 900000).as("doc_id"),
        concat(lit("lead words "), substring(col("text"), 3, 120),
          lit(" tail words")).as("text"))
    def probe() = Dedup.exactCrossDupIndexed(spark, idx, batch)
      .select(col("doc_id"), col("span_start").cast("long"),
        col("span_end").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val grown = probe()
    assert(grown.nonEmpty)
    val rawRows = spark.read.parquet(s"$idx/windows").count()
    Dedup.compactExactWindowIndex(spark, idx)
    assert(partCount(s"$idx/windows", "ingest_batch=") == 1)
    assert(probe() == grown, "folded window index must probe identically")
    assert(spark.read.parquet(s"$idx/windows").count() < rawRows,
      "the fold must collapse cross-partition duplicate keys")
    // manifest untouched: appends still work after the fold
    Dedup.appendToExactWindowIndex(
      d.where(col("doc_id") >= 35 && col("doc_id") < 40), idx)
    assert(partCount(s"$idx/windows", "ingest_batch=") == 2)
    rm(idx)
  }

  // ---- drift index ---------------------------------------------------------

  test("drift compaction: folds grown + purge deltas, drops zero bins, refuses markerless") {
    def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "b")
    val f = Seq("b" -> col("b"))
    val dir = tmp("graft-drift-compact")
    val idx = s"$dir/i"
    Curation.buildDriftIndex(
      corpus(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "C"), f, idx)
    Curation.appendToDriftIndex(corpus(10L -> "A", 11L -> "B"), f, idx, 0L)
    // purge the only C — its bin total reaches zero and must VANISH in
    // the fold, exactly as read-time summation drops it
    Curation.purgeFromDriftIndex(corpus(4L -> "C"), f, idx, 0L)
    val batch = corpus(20L -> "A", 21L -> "B")
    def probe() = Curation.driftAgainstIndex(idx, batch, f).collect().toSeq
    val before = probe()
    assert(partCount(idx, "ingest=") == 3)
    Curation.compactDriftIndex(spark, idx)
    assert(partCount(idx, "ingest=") == 1)
    assert(probe() == before, "folded histograms must probe identically")
    val bins = spark.read.parquet(idx)
    assert(bins.where(col("bin") === "VC").count() == 0,
      "a fully-departed bin must not survive the fold")
    assert(bins.where(col("cs") <= 0).count() == 0,
      "no zero/negative bins may persist past a fold")
    // idempotent no-op on a single-seed index
    Curation.compactDriftIndex(spark, idx)
    assert(probe() == before)
    // markerless layouts are refused here too (r16 format gate)
    java.nio.file.Files.delete(java.nio.file.Paths.get(idx, "_GRAFT_DRIFT_FORMAT"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(idx, "._GRAFT_DRIFT_FORMAT.crc"))
    intercept[IllegalArgumentException] { Curation.compactDriftIndex(spark, idx) }
    rm(dir)
  }

  // ---- BM25 postings --------------------------------------------------------

  test("bm25 batch fold: probes identical, crash windows converge, takedown state survives") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val idx = tmp("graft-bm25-compact")
    Retrieval.buildBm25Index(d.where(col("doc_id") < 30), idx)
    Retrieval.appendToBm25Index(
      d.where(col("doc_id") >= 30 && col("doc_id") < 60), idx)
    Retrieval.appendToBm25Index(d.where(col("doc_id") >= 60), idx)
    // a logical purge BEFORE the fold: its registry + purged mask must
    // carry across the fold unchanged
    Retrieval.purgeFromBm25Index(spark, idx, Seq(5L, 35L).toDF("doc_id"))
    def probe() = Retrieval.bm25IndexedTopK(spark, idx,
        Seq("spark", "window", "merge"), 10)
      .as[(Long, Double)].collect().toSeq
    val grown = probe()
    assert(partCount(s"$idx/postings", "batch=") == 3)

    // crash window: a stray postings partition from an interrupted prior
    // fold (written, never committed) — the entry GC clears it
    d.where(col("doc_id") < 3).select(lit("x").as("term"),
        col("doc_id"), lit(1L).as("tf"), lit(1L).as("dl"))
      .write.parquet(s"$idx/postings/batch=-99")
    Retrieval.compactBm25Batches(spark, idx)
    assert(partCount(s"$idx/postings", "batch=") == 1,
      "fold must collapse to one postings partition")
    assert(probe() == grown, "folded index must score bit-identically")
    // purged mask survived the fold: physical compaction still works
    Retrieval.compactBm25Postings(spark, idx)
    assert(probe() == grown)
    assert(spark.read.parquet(s"$idx/postings")
      .where(col("doc_id").isin(5L, 35L)).count() == 0,
      "post-fold physical purge must still remove tombstoned rows")
    // registry survived: re-ingesting a purged id is still refused
    val ex = intercept[IllegalArgumentException] {
      Retrieval.appendToBm25Index(
        d.where(col("doc_id") === 5L), idx)
    }
    assert(ex.getMessage.contains("purged"), ex.getMessage)
    // idempotent no-op once folded
    Retrieval.compactBm25Batches(spark, idx)
    assert(probe() == grown)
    rm(idx)
  }
}
