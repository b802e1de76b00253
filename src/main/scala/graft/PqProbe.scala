package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** PQ-index compression probe at scale (the claim's spec lock is
  * SimilaritySpec's indexed==inline assertion on toy data): inflates the
  * embeddings table N× with deterministically-perturbed shifted copies,
  * builds the codes layout, and reports the on-disk bytes each ranking
  * path scans (corpus parquet vs codes parquet), wall times (warmed), and
  * recall@10 vs the exact brute-force baseline — the bytes ratio is the
  * 100 TB argument (codes ≈ numSubs small ints/vector vs dim floats) made
  * observable.
  *
  * Usage: runMain graft.PqProbe <sfDir> [inflate]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PqProbe <sfDir> [inflate]")
    val dir = args(0)
    val inflate = if (args.length > 1) args(1).toInt else 40
    val spark = ProbeHarness.session()

    val base = Tables(spark, dir, "embeddings")
    val n = base.count()
    // shifted copies with per-coordinate deterministic perturbation (no
    // rand(): hash of (REPLICA, id, coordinate) — the replica index must
    // be inside the hash or every replica of a vector is byte-identical
    // and the probe measures a degenerate 39-fold-duplicated corpus; the
    // outer CAST keeps the copies float32 so the written corpus stays the
    // width the compression claim is about (a bare /9970.0 would promote
    // to double and union-widen the whole table)
    val copies = (1 until inflate).map { r =>
      base.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> CAST(x + pmod(hash($r * 131 + vec_id + i * 7), 997) / 9970.0 AS FLOAT))")
          .as("embedding"))
    }
    val corpusDir = java.nio.file.Files.createTempDirectory("graft-pq-corpus").toString
    copies.foldLeft(base.select(col("vec_id"), col("embedding")))(_ unionAll _)
      .write.mode("overwrite").parquet(s"$corpusDir/embeddings.parquet")
    val e = spark.read.parquet(s"$corpusDir/embeddings.parquet")
    val q = base.where(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .head().getSeq[Double](0)

    val idx = java.nio.file.Files.createTempDirectory("graft-pq-index").toString
    val (buildSec, _) = ProbeHarness.time(Similarity.buildPqIndex(e, idx))

    def dirBytes(p: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    // warm both paths (JIT + page cache), then measure
    Similarity.bruteForceTopK(e, q, 10).collect()
    Similarity.pqTopKIndexed(e, idx, q, 10).collect()
    val (bSec, bRows) = ProbeHarness.time(Similarity.bruteForceTopK(e, q, 10).collect())
    val truth = bRows.map(_.getLong(0)).toSet
    val corpusBytes = dirBytes(s"$corpusDir/embeddings.parquet")
    val codesBytes = dirBytes(s"$idx/codes")
    println(f"[pqprobe] vectors=${n * inflate}%d inflate=$inflate%d build=$buildSec%.1f s")
    println(f"[pqprobe] ranking-scan bytes: corpus=$corpusBytes%d codes=$codesBytes%d " +
      f"ratio=${corpusBytes.toDouble / codesBytes}%.1fx")
    println(f"[pqprobe] brute=$bSec%.2f s")
    // rescoreK is THE recall knob (the exact rescore stays id-pruned and
    // cheap); sweep it so the recall-vs-work trade is on the record
    Seq(40, 400, 4000).foreach { rk =>
      val (iSec, iRows) =
        ProbeHarness.time(Similarity.pqTopKIndexed(e, idx, q, 10, rescoreK = rk).collect())
      val recall = iRows.map(_.getLong(0)).count(truth)
      println(f"[pqprobe] indexed rescoreK=$rk%d: $iSec%.2f s recall@10=$recall%d/10")
    }

    // IVF-PQ: the coarse cells must MULTIPLY the byte savings — the probed
    // codes scan reads ~nProbe/nCells of the (already ~40× compressed)
    // codes bytes. Measured from FileSourceScanExec metrics on the pruned
    // scan, not estimated.
    val ivfpq = java.nio.file.Files.createTempDirectory("graft-ivfpq-probe").toString
    val (b2Sec, _) = ProbeHarness.time(Similarity.buildIvfPqIndex(e, ivfpq))
    Similarity.ivfPqTopK(e, ivfpq, q, 10, rescoreK = 400).collect() // warm
    val (pSec, pRows) =
      ProbeHarness.time(Similarity.ivfPqTopK(e, ivfpq, q, 10, rescoreK = 400).collect())
    val pRecall = pRows.map(_.getLong(0)).count(truth)
    val probedCodes = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      val cents = spark.read.parquet(s"$ivfpq/centroids")
      val someCells = cents.select(col("cell")).limit(4)
        .collect().map(_.getLong(0)).toSeq
      val df = spark.read.parquet(s"$ivfpq/codes")
        .where(col("cell").isin(someCells: _*))
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s }
        .map(s => s.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum
    }
    val allCodesBytes = dirBytes(s"$ivfpq/codes")
    println(f"[pqprobe] ivfpq: build=$b2Sec%.1f s probe=$pSec%.2f s recall@10=$pRecall%d/10 " +
      f"probed_codes_bytes=$probedCodes%d of $allCodesBytes%d " +
      f"(corpus ratio=${corpusBytes.toDouble / probedCodes}%.0fx)")
    spark.stop()
  }
}
