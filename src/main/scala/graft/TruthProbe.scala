package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-truth prefix-filter probe (round 14): measures what AllPairs-style
  * prefix filtering buys `Dedup.exactNearDupTruth` — the naive truth join
  * pairs every two docs sharing ANY shingle (corpus-wide boilerplate
  * shingles make that quadratic); the prefix join only pairs docs sharing
  * one of their first |X| − ⌈t·|X|⌉ + 1 shingles under the global
  * rarest-first order, which by the AllPairs completeness theorem loses no
  * J ≥ t pair. Arms run interleaved on the dd_recall fixture corpus
  * (documents + high-J suffix twins + mid-J 60%-prefix twins), asserting
  * the naive candidate set CONTAINS the prefix set and that both score to
  * the identical truth; the headline numbers are the candidate-pair counts
  * (structural, noise-free) plus warmed walls.
  *
  * Usage: runMain graft.TruthProbe <sfDir> [minJaccard=0.5]
  */
object TruthProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TruthProbe <sfDir> [minJaccard] [boiler]")
    val dir = args(0)
    val t = if (args.length > 1) args(1).toDouble else 0.5
    // `boiler`: every doc carries a shared boilerplate tail — the
    // corpus-wide-hot-shingle regime (footers, licenses, templates) where
    // the naive join degenerates to all-pairs and prefix filtering is
    // the difference between O(n²) and O(real near-dup work)
    val boiler = args.contains("boiler")
    val spark = ProbeHarness.session()
    val d0 = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val d = if (!boiler) d0 else d0.select(col("doc_id"),
      concat(col("text"),
        lit(" shared footer terms apply all rights reserved contact us " +
          "subscribe to the newsletter for updates")).as("text"))
    val corpus = d
      .unionAll(d.where(col("doc_id") < 20)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text")))
      .unionAll(d.where(col("doc_id") < 40)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat(
            expr("substring(text, 1, CAST(FLOOR(length(text)*3/5) AS INT))"),
            lit(" y"), col("doc_id").cast("string")).as("text")))
      .persist()
    val nDocs = corpus.count()

    val sh = Dedup.shingles(corpus)
      .select(col("doc_id"),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("sk"))
      .persist()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    def naiveCand: DataFrame = sh.as("a").join(sh.as("b"),
        col("a.sk") === col("b.sk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val dfc = sh.groupBy(col("sk")).agg(count(lit(1)).as("df"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("sk"))
    def prefixCand: DataFrame = {
      val prefix = sh.join(dfc, "sk")
        .withColumn("rnk", row_number().over(byDoc))
        .join(sizes, "doc_id")
        .where(col("rnk") <= col("n_sh") - ceil(lit(t) * col("n_sh")) + 1)
        .select(col("doc_id"), col("sk"))
      prefix.as("a").join(prefix.as("b"),
          col("a.sk") === col("b.sk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    }
    // warmup both arms once (JIT/committer setup must not land on arm 1)
    naiveCand.count(); prefixCand.count()
    var rnd = 0
    while (rnd < 3) {
      val (nSec, nPairs) = ProbeHarness.time(naiveCand.count())
      val (pSec, pPairs) = ProbeHarness.time(prefixCand.count())
      println(f"[truth] round $rnd%d: naive $nPairs%8d cand pairs " +
        f"($nSec%5.2f s), prefix $pPairs%8d ($pSec%5.2f s), " +
        f"cut ${nPairs.toDouble / math.max(1, pPairs)}%5.1fx")
      rnd += 1
    }
    // completeness end to end: both candidate sets score to the same truth
    val truth = Dedup.exactNearDupTruth(corpus, t)
      .select(col("doc_a"), col("doc_b"))
    val naiveScored = {
      val inter = naiveCand.as("c")
        .join(sh.as("sa"), col("c.doc_a") === col("sa.doc_id"))
        .join(sh.as("sb"),
          col("c.doc_b") === col("sb.doc_id") && col("sa.sk") === col("sb.sk"))
        .groupBy(col("c.doc_a").as("doc_a"), col("c.doc_b").as("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
        .where(round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 6)
          >= t)
        .select(col("doc_a"), col("doc_b"))
    }
    val diff = truth.exceptAll(naiveScored).count() +
      naiveScored.exceptAll(truth).count()
    require(diff == 0, s"prefix-filtered truth diverged from naive by $diff pairs")
    println(s"[truth] $nDocs docs, t=$t: prefix truth == naive truth " +
      s"(${truth.count()} pairs) — completeness holds end to end")
    spark.stop()
  }
}
