package graft

import graft.operators.Retrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 index growth probe (round 13): measures the layout's core claim
  * (`Retrieval.scala` layout note) — an append is O(batch + vocabulary),
  * INDEPENDENT of the standing corpus, because the standing postings are
  * never read, re-tokenized or rewritten; only the vocabulary-scale df
  * merge and 1-row stats roll forward. The counterfactual is the rebuild,
  * which re-tokenizes everything and grows with the corpus.
  *
  * Arms, interleaved at each standing size 1×/2×/4×/8× of the sf corpus
  * (copies are id-shifted, texts salted with a copy token so postings are
  * real, not degenerate duplicates):
  *   - append of a FIXED 10%-of-base batch onto the grown standing index
  *   - full rebuild at that standing size
  * The flat append line against the growing rebuild line is the claim.
  * Each append lands on a FRESH copy of the grown index (cheap dir copy)
  * so arms never compound. Correctness of grown == rebuilt is
  * RetrievalSpec's and the oracle's job; this probe is the cost curve.
  *
  * Usage: runMain graft.Bm25GrowProbe <sfDir> [maxFactor=8]
  */
object Bm25GrowProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Bm25GrowProbe <sfDir> [maxFactor]")
    val dir = args(0)
    val maxFactor = if (args.length > 1) args(1).toInt else 8
    val spark = ProbeHarness.session()
    import spark.implicits._
    val cpus = spark.sparkContext.defaultParallelism
    val root = "/tmp/graft-bm25growprobe"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val nBase = base.count()
    def corpusAt(factor: Int): DataFrame = base
      .select(explode(sequence(lit(0), lit(factor - 1))).as("c"),
        col("doc_id"), col("text"))
      .select((col("doc_id") + col("c") * 10000000L).as("doc_id"),
        concat(col("text"), lit(" copysalt"), col("c")).as("text"))
      .repartition(cpus)
    // the fixed arriving batch: 10% of base, ids outside every copy space
    val batch = base.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 900000000L).as("doc_id"),
        concat(col("text"), lit(" arrives")).as("text"))
      .persist()
    println(s"[bm25grow] base $nBase docs from $dir; fixed batch " +
      s"${batch.count()} docs; standing factors 1..$maxFactor")
    // untimed warmup write: the session's first parquet write pays
    // JIT/committer setup that must not land on the first timed arm
    Retrieval.buildBm25Index(batch, s"$root/warmup")

    var factor = 1
    while (factor <= maxFactor) {
      val standing = corpusAt(factor).persist()
      standing.count()
      // rebuild arm (also produces the standing index the append lands on)
      val (rebuildSec, _) = ProbeHarness.time {
        Retrieval.buildBm25Index(standing, s"$root/f$factor/built")
      }
      // append arm on a fresh copy of the built index
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(s"$root/f$factor/built"),
        fs, new org.apache.hadoop.fs.Path(s"$root/f$factor/grown"),
        false, spark.sparkContext.hadoopConfiguration)
      val (appendSec, _) = ProbeHarness.time {
        Retrieval.appendToBm25Index(batch, s"$root/f$factor/grown")
      }
      println(f"[bm25grow] standing ${factor}x (${nBase * factor}%7d docs): " +
        f"rebuild $rebuildSec%6.2f s, append(fixed batch) $appendSec%6.2f s")
      standing.unpersist()
      factor *= 2
    }
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
