package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100×-DISTINCT-docs saturation probe for the dedup chain's caps
  * (VERDICT r9 #5): the regime `ScaleGen scale-docs` cannot reach —
  * its key-shifted copies are EXACT duplicates, which dedup-first
  * collapses back to 1× rep scale, so neither the fp-bucket cap nor the
  * LSH band-bucket cap ever fires. This probe builds corpora whose scale
  * is 100× in DISTINCT texts:
  *
  *  - `distinct` arm: `factor` key-shifted copies, each copy's text
  *    SALTED with a copy-specific 2-ASCII-char pair after every 8th char
  *    (`regexp_replace(text, "(........)", "$1<salt_i>")`). Both members
  *    of every within-copy pair transform identically, so each stratum
  *    preserves the base corpus's pair structure exactly; every 32-char
  *    window spans ≥2 complete salt pairs, so no fingerprint survives
  *    across strata, and word shingles leak only via salt-free short-word
  *    trigrams (measured: +7% LSH candidates at factor 5, score-killed
  *    downstream). Two rejected designs, both measured: translate-vowel
  *    substitution leaked badly (o-free windows shared between copies
  *    whose maps differed only in the o target — pairs grew 51× at
  *    factor 5), and non-ASCII salt chars made every query ~4× slower
  *    (multi-byte strings demote UTF8String.substring from O(1) byte
  *    offsets to O(n) char walks — quadratic inside the gram loop).
  *    Expectation: fp-bucket sizes unchanged, pair volume and wall
  *    ~linear in `factor`.
  *  - `boiler` arm: the distinct arm plus ONE fixed ~300-char boilerplate
  *    line appended to EVERY doc — boilerplate fingerprints and
  *    boilerplate-dominated minhash band signatures are shared by
  *    factor×5000 DISTINCT texts, far past `maxBucket`=1000. Expectation:
  *    the `tooBig` fp cap and the band-bucket cap fire (reported), the
  *    queries complete at ~distinct-arm cost instead of k²-exploding.
  *  - `stripped` arm: the boiler arm run through
  *    `TextAnalysis.stripBoilerplate` first — the upstream defense the
  *    saturation measurement points at. Expectation: the corpus-wide line
  *    is deleted (strip wall reported), fp/band buckets return to
  *    distinct-arm shape, and every query reads ~distinct-arm numbers.
  *
  * Probed queries: `dd_substring` (`substringDupPairs`), `dd_edit_gated`
  * (`editSimilarityGated`), and `dd_cross_indexed` (index build timed
  * once per arm as build cost; the per-batch probe — the operational
  * number — timed per round; its claim is FLAT cost as the corpus grows,
  * because the probe reads candidate-pruned index rows, not the corpus).
  *
  * Usage: runMain graft.CapProbe <sfDir> [factor=100] [rounds=2]
  */
object CapProbe {
  private val KeyOff = 10000000L

  // ~300 chars of fixed boilerplate: enough gram windows (~270) to own
  // dozens of winnowed fingerprints and compete for minhash seed minima.
  private val Boiler =
    "standard license header the contents of this document are provided " +
    "for general information purposes only and carry no warranty of any " +
    "kind either express or implied including but not limited to fitness " +
    "for a particular purpose all rights reserved redistribution is " +
    "permitted provided this notice is preserved intact"

  // Copy-specific 2-char ASCII salt: printable ASCII minus the two Java
  // replacement-string metacharacters ('$', '\') — 92² combos. ASCII-only
  // is load-bearing (see scaladoc); ALL strata are salted (including copy
  // 0) so the arms are uniform in per-doc length and cost.
  private def salt(i: Int): String = {
    val a = (33 to 126).filter(c => c != '$' && c != '\\').map(_.toChar)
    s"${a(i / a.length)}${a(i % a.length)}"
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CapProbe <sfDir> [factor] [rounds]")
    val dir = args(0)
    val factor = if (args.length > 1) args(1).toInt else 100
    val rounds = if (args.length > 2) args(2).toInt else 2
    require(factor >= 1 && factor <= 500, s"factor $factor out of range")
    val spark = ProbeHarness.session()
    import spark.implicits._

    val root = "/tmp/graft-capprobe"
    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val mx = base.agg(max(col("doc_id"))).collect()(0).getLong(0)
    require(mx < KeyOff, s"doc_id max $mx >= shift $KeyOff")

    def strata(src: DataFrame): DataFrame =
      (0 until factor).map { i =>
        src.select((col("doc_id") + lit(i * KeyOff)).as("doc_id"),
          regexp_replace(col("text"), "(........)", "$1" + salt(i)).as("text"))
      }.reduce(_ unionByName _)

    // Materialize every arm to parquet so every timed query reads the same
    // physical shape the catalog queries read (a parquet scan, not an
    // in-memory union lineage). The 1× arm is the SALTED stratum 0, so the
    // N×/1× wall ratio compares equal per-doc text shapes.
    val all = strata(base).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (wOne, _) = ProbeHarness.time {
      all.where(col("doc_id") < KeyOff).write.mode("overwrite").parquet(s"$root/one")
    }
    val (wDistinct, _) = ProbeHarness.time {
      all.write.mode("overwrite").parquet(s"$root/distinct")
    }
    // The boilerplate rides its own LINE so the `stripped` arm can target
    // it with the line-level cleaner; the dedup chain sees it all the same
    // (shingle/gram saturation does not care about the separator).
    val (wBoiler, _) = ProbeHarness.time {
      all.select(col("doc_id"), concat(col("text"), lit("\n" + Boiler)).as("text"))
        .write.mode("overwrite").parquet(s"$root/boiler")
    }
    all.unpersist()
    // The defense arm: strip the corpus-wide line BEFORE dedup. Timed and
    // materialized like the others — the strip wall is the price of
    // admission to distinct-arm dedup numbers.
    val (wStrip, _) = ProbeHarness.time {
      graft.operators.TextAnalysis
        .stripBoilerplate(spark.read.parquet(s"$root/boiler"))
        .write.mode("overwrite").parquet(s"$root/stripped")
    }
    println(f"[capprobe] corpora built: 1x $wOne%.1f s, distinct $wDistinct%.1f s, " +
      f"boiler $wBoiler%.1f s, strip pass $wStrip%.1f s (factor=$factor)")

    case class Arm(name: String, docs: DataFrame)
    val arms = Seq(
      Arm("1x", spark.read.parquet(s"$root/one")),
      Arm(s"${factor}x-distinct", spark.read.parquet(s"$root/distinct")),
      Arm(s"${factor}x-boiler", spark.read.parquet(s"$root/boiler")),
      Arm(s"${factor}x-stripped", spark.read.parquet(s"$root/stripped")))

    def time(label: String)(f: => Long): Double = {
      val (w, n) = ProbeHarness.time(f)
      println(f"[capprobe]   $label: $n%d rows in $w%.1f s")
      w
    }

    arms.foreach { arm =>
      val docs = arm.docs
      println(s"[capprobe] === arm ${arm.name} ===")
      println(s"[capprobe]   docs=${docs.count()}, distinct=${docs.select("text").distinct().count()}")

      // Cap evidence, computed ONCE per arm (not per round): fp-bucket
      // histogram at rep scale — how many winnowed fingerprints exceed the
      // 1000-doc cap (those do ZERO pair work in substringDupPairs), and
      // the hottest bucket the pair join actually sees after the cap.
      val reps = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), col("text"))
      val fpHist = Dedup.winnowedFingerprints(reps)
        .groupBy(col("fp")).agg(countDistinct(col("doc_id")).as("n"))
        .agg(count(lit(1)).as("fps"),
          sum(when(col("n") > 1000, 1L).otherwise(0L)).as("capped"),
          max(col("n")).as("hottest"),
          max(when(col("n") <= 1000, col("n"))).as("hottest_surviving"))
        .collect()(0)
      println(s"[capprobe]   fp buckets: total=${fpHist.getLong(0)}, capped(>1000 docs)=${fpHist.getLong(1)}, " +
        s"hottest=${fpHist.getLong(2)}, hottest surviving=${fpHist.getLong(3)}")
      // LSH saturation evidence: candidate pairs that survive the
      // band-bucket cap at rep scale — the set dd_edit_gated gates.
      println(s"[capprobe]   lsh candidate pairs (rep scale, capped) = ${Dedup.lshCandidatePairsDedup(docs).count()}")

      (1 to rounds).foreach { r =>
        println(s"[capprobe]   round $r")
        time("dd_substring  substringDupPairs")(Dedup.substringDupPairs(docs).count())
        time("dd_edit_gated editSimilarityGated")(
          Dedup.editSimilarityGated(docs, minSim = 0.5, minAgree = 4).count())
      }

      // dd_cross_indexed: the one-time index build is the corpus-scale
      // cost; the per-batch probe is the recurring one. The batch is the
      // catalog query's shape, drawn from stratum 0 so its candidates hit
      // a fixed-size slice of the corpus no matter the factor — the probe
      // SHOULD read ~flat across arms.
      val idxDir = s"$root/index-${arm.name}"
      val (wBuild, _) = ProbeHarness.time(Dedup.buildCrossNearDupIndex(docs, idxDir))
      println(f"[capprobe]   dd_cross_indexed index build: $wBuild%.1f s (one-time)")
      val d0 = docs.where(col("doc_id") < KeyOff)
      val batch = d0.where(col("doc_id") < 30)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
        .unionAll(d0.where(col("doc_id") >= 30 && col("doc_id") < 40)
          .select((col("doc_id") + 300000L).as("doc_id"), col("text")))
        .unionAll(d0.where(col("doc_id") >= 40 && col("doc_id") < 60)
          .select((col("doc_id") + 400000L).as("doc_id"), upper(col("text")).as("text")))
      (1 to rounds).foreach { _ =>
        time("dd_cross_indexed probe")(
          Dedup.crossNearDupIndexed(spark, idxDir, batch, threshold = 0.5).count())
      }
    }
    spark.stop()
  }
}
