package graft

import graft.operators.Bpe
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Production-scale BPE probe (round 13): measures the claim the kernel's
  * scaladoc argues but r12 never benchmarked — `Bpe.encodeDocs`' cost is
  * O(len × rounds), INDEPENDENT of merge-list size, so a real 50k-merge
  * vocabulary (GPT-2 scale) costs the same as the 29-entry fixture. The
  * codegen'd replace chain is the opposite trade (O(len × |merges|) per
  * row): right for fixture-scale lists and the oracle, unusable at 50k —
  * which is exactly why both paths exist off one validated merge list.
  *
  *   1. A/B the kernel: fixture (29 merges) vs `Bpe.syntheticMerges(50k)`
  *      over the same corpus, warmed and interleaved — the flat line IS
  *      the claim (modulo the one-off 50k rank-map build per partition).
  *   2. Scale the CORPUS ×10 under the 50k list — cost must scale with
  *      data (linear kernel), not with vocabulary.
  *   3. Agreement at the big vocab: the priority loop == the sequential
  *      rank-order replace semantics on every distinct corpus word
  *      (driver-side sequential replay; the invariant BpeSpec pins at
  *      fixture scale, re-proven where the Column path can't follow).
  *
  * Usage: runMain graft.BpeProbe <sfDir> [nMerges=50000] [rounds=3] [copies=10]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BpeProbe <sfDir> [nMerges] [rounds] [copies]")
    val dir = args(0)
    val nMerges = if (args.length > 1) args(1).toInt else 50000
    val rounds = if (args.length > 2) args(2).toInt else 3
    val copies = if (args.length > 3) args(3).toInt else 10
    val spark = ProbeHarness.session()
    import spark.implicits._
    val cpus = spark.sparkContext.defaultParallelism

    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(cpus)
      .persist()
    val (nDocs, nChars) = docs
      .agg(count(lit(1)), sum(length(col("text"))))
      .as[(Long, Long)].head()
    val big = Bpe.syntheticMerges(nMerges)
    println(s"[bpeprobe] $nDocs docs / $nChars chars from $dir, $cpus cores, " +
      s"arms: fixture=${Bpe.fixtureMerges.size} vs synthetic=${big.size} merges")

    def run(label: String, d: DataFrame, merges: Seq[(String, String)]): Unit = {
      val secs = (1 to rounds).map { _ =>
        val (w, _) = ProbeHarness.time {
          Bpe.encodeDocs(d, merges).agg(sum(col("bpe_tokens"))).head()
        }
        w
      }
      val best = secs.min
      val chars = nChars * (if (label.contains("x10")) copies.toLong else 1L)
      println(f"[bpeprobe] $label%-22s ${secs.map(s => f"$s%.2f").mkString(" ")}s " +
        f"(best $best%.2f s, ${chars / best / 1e6}%.1f Mchars/s)")
    }

    // warm both arms once (parquet cache, codegen), then interleave
    run("warmup-fixture", docs, Bpe.fixtureMerges)
    run("warmup-big", docs, big)
    (1 to 2).foreach { _ =>
      run(s"fixture(${Bpe.fixtureMerges.size})", docs, Bpe.fixtureMerges)
      run(s"synthetic($nMerges)", docs, big)
    }

    // corpus ×10 under the big list: linear in data, flat in vocabulary
    val docs10 = docs
      .select(explode(sequence(lit(0), lit(copies - 1))).as("c"),
        col("doc_id"), col("text"))
      .select((col("doc_id") + col("c") * 10000000L).as("doc_id"), col("text"))
      .repartition(cpus)
      .persist()
    docs10.count()
    run(s"synthetic($nMerges) x10", docs10, big)

    // The corpus above has a tiny vocabulary (the memo amortizes nearly
    // everything), so also probe a DISTINCT-VOCAB corpus — every word
    // unique across the corpus (md5 hex re-lettered into [a-p] so the
    // synthetic level-1 pairs all apply), the memo-miss-heavy worst case
    // where the merge loop itself is the cost. Same corpus, growing merge
    // lists: the kernel's flat line across 676 → 50k merges IS the
    // O(len × rounds) claim (work per word is bounded by its length, not
    // the list; the small fixed offset is the per-partition rank-map
    // build).
    val dv = docs
      .select(col("doc_id"), explode(sequence(lit(0), lit(59))).as("i"))
      .select(col("doc_id"),
        translate(substring(md5(concat(col("doc_id"), lit("|"), col("i"))), 1, 8),
          "0123456789", "ghijklmnop").as("w"))
      .groupBy(col("doc_id")).agg(concat_ws(" ", collect_list(col("w"))).as("text"))
      .repartition(cpus).persist()
    val dvChars = dv.agg(sum(length(col("text")))).as[Long].head()
    println(s"[bpeprobe] distinct-vocab corpus: ${dv.count()} docs / " +
      s"$dvChars chars, ~${nDocs * 60} distinct 8-char words")
    def runDv(label: String, merges: Seq[(String, String)]): Double = {
      val secs = (1 to rounds).map { _ =>
        ProbeHarness.time {
          Bpe.encodeDocs(dv, merges).agg(sum(col("bpe_tokens"))).head()
        }._1
      }
      println(f"[bpeprobe] dv $label%-19s ${secs.map(s => f"$s%.2f").mkString(" ")}s " +
        f"(best ${secs.min}%.2f s, ${dvChars / secs.min / 1e6}%.1f Mchars/s)")
      secs.min
    }
    runDv("warmup", Bpe.syntheticMerges(676))
    Seq(676, 5000, nMerges).foreach(n => runDv(s"kernel($n)", Bpe.syntheticMerges(n)))

    // The codegen'd replace chain is the OPPOSITE cost class —
    // O(len × |merges|) per row. Time it on the same distinct-vocab
    // corpus at chain depths still compilable; the per-merge slope is
    // what rules it out at 50k (the kernel exists precisely for that).
    def runChain(n: Int): Unit = {
      val merges = Bpe.syntheticMerges(n)
      val secs = (1 to rounds).map { _ =>
        ProbeHarness.time {
          dv.select(sum(Bpe.tokenCount(col("text"), merges))).head()
        }._1
      }
      println(f"[bpeprobe] dv chain($n%-5d)       ${secs.map(s => f"$s%.2f").mkString(" ")}s " +
        f"(best ${secs.min}%.2f s)")
    }
    Seq(50, 100, 200, 400).foreach(runChain)

    // merge LEARNING at production scale: the incremental driver loop
    // (pair-indexed, TreeSet argmax) over the distinct-vocab corpus's
    // word-count table — the naive recount alternative is
    // O(n · vocab · len) and would take hours here
    val (wcSec, wcRows) = ProbeHarness.time {
      graft.operators.Bpe.wordCounts(dv).count()
    }
    Seq(500, 5000).foreach { k =>
      val (learnSec, learned) = ProbeHarness.time {
        graft.operators.Bpe.learnMerges(dv, n = k, minCount = 2)
      }
      println(f"[bpeprobe] learnMerges($k%5d) over $wcRows words " +
        f"(count pass $wcSec%.2f s): $learnSec%.2f s, ${learned.size} learned")
    }

    // agreement at the big vocab: priority loop == sequential replace
    // semantics, driver-side, on every distinct natural-corpus word plus
    // a distinct-vocab sample
    val words = docs.select(explode(split(col("text"), " ")).as("w")).distinct()
      .unionAll(dv.select(explode(split(col("text"), " ")).as("w")).limit(2000))
      .as[String].collect()
    val bad = words.filter(w =>
      Bpe.encodeWordPriority(w, big) != Bpe.encodeWordSequential(w, big))
    require(bad.isEmpty,
      s"priority/sequential disagree at $nMerges merges on: ${bad.take(5).toSeq}")
    println(s"[bpeprobe] agreement: ${words.length} words " +
      s"(corpus vocab + distinct-vocab sample), priority == sequential at $nMerges merges")
    spark.stop()
  }
}
