package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Book-length-text probe for the winnowing fingerprinter (VERDICT r9
  * stretch #8): `winnowedFingerprints` is one nested higher-order-function
  * projection — `transform(sequence(1, len-31), md5 gram hash)` then
  * `transform(…, array_min(slice(hs, j, 16)))` — and higher-order
  * functions are CodegenFallback in Spark, so the question at 50–100 KB
  * texts (the regime substring dedup targets) is whether cost stays
  * linear in chars or falls off a cliff (per-row allocation, eval-mode
  * interpretation overhead).
  *
  * The probe inflates each sf doc's text to `inflate` distinct segments
  * (`text seg<r>` — per-segment markers keep windows distinct, so the
  * winnow actually selects ~len/w fingerprints instead of degenerating on
  * repeats), measures the full fingerprint projection at each inflate
  * step, and reports MB/s plus the per-doc fp yield. At the top step it
  * also runs the complete `substringDupPairs` to show the pair join holds
  * when every doc carries thousands of fingerprints.
  *
  * Usage: runMain graft.WinnowProbe <sfDir> [rounds=2] [inflates=1,16,64,128,256]
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: WinnowProbe <sfDir> [rounds] [inflates]")
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 2
    val inflates = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
                   else Seq(1, 16, 64, 128, 256)
    val spark = ProbeHarness.session()

    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = base.count()
    println(s"[winnowprobe] $nDocs docs from $dir")

    def inflated(f: Int) =
      if (f == 1) base
      else base.select(col("doc_id"), expr(
        s"array_join(transform(sequence(1, $f), r -> concat(text, ' seg', r)), ' ')").as("text"))

    inflates.foreach { f =>
      val docs = inflated(f)
      val chars = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)
      val avgLen = chars / nDocs
      (1 to rounds).foreach { r =>
        val (w, fps) = ProbeHarness.time(Dedup.winnowedFingerprints(docs).count())
        println(f"[winnowprobe] inflate=$f%3d avgLen=$avgLen%7d fps=$fps%9d " +
          f"(${fps.toDouble / nDocs}%.0f/doc) wall=$w%6.1f s  ${chars / 1e6 / w}%6.1f MB/s" +
          (if (r > 1) " (rerun)" else ""))
      }
    }

    // Full operator at the top length: fingerprint projection + fp-bucket
    // pair join + shared-count aggregate, all at book length.
    val top = inflates.max
    (1 to rounds).foreach { _ =>
      val (w, n) = ProbeHarness.time(Dedup.substringDupPairs(inflated(top)).count())
      println(f"[winnowprobe] substringDupPairs at inflate=$top: $n%d pairs in $w%.1f s")
    }
    spark.stop()
  }
}
