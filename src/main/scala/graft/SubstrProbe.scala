package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Book-length probe for the exact-substring-dedup kernels (round 11).
  *
  * `Dedup.exactSubstringSpans` hashes EVERY length-L character window of
  * every document. The natural SQL spelling —
  * `transform(sequence(1, n-L+1), p -> xxhash64(substring(text, p, L)))`
  * — is O(len²) per doc (substring's per-call byte walk from position 0;
  * the same cliff WinnowProbe measured for winnow_fps at 5 KB 1.7 s →
  * 50 KB 120 s), which is why the operator runs on the native
  * `window_hash64` rolling kernel (O(len) total) and extracts survivor
  * windows with `char_windows` (one offset walk) instead of per-position
  * substring. This probe is the keeper of that measurement for the
  * window-hash kernels:
  *   1. A/B the hash projection (native vs HOF) across md5-chain corpora
  *      of growing doc length, warmed and interleaved, HOF capped at the
  *      length where the quadratic is already unambiguous;
  *   2. assert the kernels agree on the thing the operator consumes —
  *      the duplicated-(doc_id, pos) survivor set — at an uncapped
  *      length (values differ between xxhash64 and the rolling hash;
  *      the downstream exact-substring regroup is hash-agnostic);
  *   3. run the FULL operator at the top length (every 10th doc shares a
  *      planted leading passage, so real spans exist at book length).
  *
  * Usage: runMain graft.SubstrProbe <sfDir> [rounds=2] [segs=10,150,750,1500]
  *        (33×segs ≈ chars/doc: 330, 5k, 25k, 50k)
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SubstrProbe <sfDir> [rounds] [segs]")
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 2
    val segsList = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
                   else Seq(10, 150, 750, 1500)
    val L = 40
    val spark = ProbeHarness.session()
    graft.functions.GraftFunctions.ensure(spark)
    val cpus = spark.sparkContext.defaultParallelism
    val root = "/tmp/graft-substrprobe"

    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val nDocs = base.count()
    println(s"[substrprobe] $nDocs docs from $dir, $cpus cores, L=$L")

    // md5-chain segments: every window distinct except the planted shared
    // passage on every 10th doc (10 segments ≈ 330 chars — long enough to
    // produce one merged span per carrier beyond the first)
    val shared = "array_join(transform(sequence(1, 10), r -> md5(concat('sharedseed', r))), ' ')"
    def gen(segs: Int): String =
      s"array_join(transform(sequence(1, $segs), r -> md5(concat(text, '|', r))), ' ')"
    segsList.foreach { f =>
      val (w, _) = ProbeHarness.time {
        base.repartition(cpus)
          .select(col("doc_id"),
            when(col("doc_id") % 10 === 0,
              expr(s"concat($shared, ' ', ${gen(f)})"))
              .otherwise(expr(gen(f))).as("text"))
          .write.mode("overwrite").parquet(s"$root/segs$f")
      }
      println(f"[substrprobe] built segs=$f corpus in $w%.1f s")
    }

    def nativeHashes(d: DataFrame): DataFrame = d
      .select(col("doc_id"), posexplode(expr(s"window_hash64(text, $L)")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("h"))
    def hofHashes(d: DataFrame): DataFrame = d
      .where(length(col("text")) >= L)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, length(text) - ${L - 1}), p -> xxhash64(substring(text, p, $L)))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("h"))

    def arm(label: String, f: Int, fn: DataFrame => DataFrame): Unit = {
      val docs = spark.read.parquet(s"$root/segs$f").repartition(cpus)
      val chars = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)
      (1 to rounds).foreach { r =>
        val (w, n) = ProbeHarness.time(fn(docs).count())
        println(f"[substrprobe] $label%-7s segs=$f%5d avgLen=${chars / nDocs}%6d " +
          f"windows=$n%10d wall=$w%6.1f s ${chars / 1e6 / w}%7.1f MB/s" +
          (if (r > 1) " (rerun)" else ""))
      }
    }

    segsList.foreach { f =>
      arm("native", f, nativeHashes)
      // the HOF form is O(len²)/doc; past ~5 KB it re-demonstrates a
      // known quadratic for minutes — cap it where the cliff is plain
      if (f <= 150) arm("hofSql", f, hofHashes)
      else println(s"[substrprobe] segs=$f: HOF arm skipped (measured quadratic)")
    }

    // Kernel agreement on what the operator consumes: the survivor set
    // {(doc_id, pos) | window hash repeated}. Hash VALUES differ between
    // kernels; survivor membership must not (equal windows hash equal in
    // both; spurious rolling-hash collisions would ADD rows here — any
    // diff is a finding).
    def survivors(h: DataFrame): DataFrame = {
      val dup = h.groupBy(col("h")).agg(count(lit(1)).as("c"))
        .where(col("c") > 1).select(col("h"))
      h.join(dup, Seq("h"), "left_semi").select(col("doc_id"), col("pos"))
    }
    segsList.filter(_ <= 150).maxOption.foreach { fEq =>
      val eqDocs = spark.read.parquet(s"$root/segs$fEq").repartition(cpus)
      val a = survivors(nativeHashes(eqDocs))
      val b = survivors(hofHashes(eqDocs))
      val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
      println(s"[substrprobe] survivor-set diff rows at segs=$fEq: $diff (must be 0)")
      require(diff == 0, "window_hash64 and the HOF form disagree on survivors")
    }

    // Full operator at the top length: spans must land on the planted
    // shared passage carriers (every 10th doc except the first carrier) —
    // asserted below, not just counted.
    val fTop = segsList.max
    val topDocs = spark.read.parquet(s"$root/segs$fTop").repartition(cpus)
    val carrierSpans = Dedup.exactSubstringSpans(topDocs, L)
      .where(col("span_start") === 1)
      .select(col("doc_id")).distinct().count()
    val carriers = topDocs.where(col("doc_id") % 10 === 0).count()
    require(carrierSpans >= carriers - 1,
      s"expected >= ${carriers - 1} leading-passage spans (all planted carriers " +
        s"except the globally-first), got $carrierSpans")
    println(s"[substrprobe] carrier check: $carrierSpans/$carriers planted docs spanned (first keeps)")
    // stage attribution: the duplicate-hash aggregate is the expected
    // dominant cost (one position-scale shuffle of mostly-unique keys)
    val topHashes = nativeHashes(topDocs)
    val (wAgg, nDup) = ProbeHarness.time(
      topHashes.groupBy(col("h")).agg(count(lit(1)).as("c"))
        .where(col("c") > 1).count())
    println(f"[substrprobe] stage dup-hash aggregate at segs=$fTop: $nDup%d dup hashes in $wAgg%.1f s")
    (1 to rounds).foreach { _ =>
      val (w, n) = ProbeHarness.time(
        Dedup.exactSubstringSpans(topDocs, L).count())
      println(f"[substrprobe] exactSubstringSpans at segs=$fTop: $n%d spans in $w%.1f s")
    }

    // Cross-corpus index at the top length: the md5 window universe costs
    // O(chars × L) md5 work ONCE at build; each probe is the (small)
    // batch's own projection + a broadcast join the index only streams
    // through. This is the steady-state ingest shape — build amortizes,
    // probes repeat.
    val idxDir = s"$root/xwin$fTop"
    val (wBuild, _) = ProbeHarness.time(
      Dedup.buildExactWindowIndex(topDocs, idxDir, L))
    println(f"[substrprobe] window index build at segs=$fTop: $wBuild%.1f s (one-time)")
    val arriving = topDocs.where(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("arriving batch lead "), substring(col("text"), 11, 5000),
          lit(" arriving tail")).as("text"))
    val nArriving = arriving.count() // outside the timed loop
    (1 to rounds).foreach { _ =>
      val (w, n) = ProbeHarness.time(
        Dedup.exactCrossDupIndexed(spark, idxDir, arriving).count())
      println(f"[substrprobe] indexed cross probe ($nArriving%d arriving docs): $n%d spans in $w%.1f s")
    }

    // Mega-group arm: ONE 74-char boilerplate block (35 fully-shared
    // leading windows at L=40) shared by EVERY one of 200k
    // otherwise-distinct docs — the regime where the pair-based scorers
    // need bucket caps (200k² candidate pairs). The span pipeline's
    // central claim is that it needs NO cap: group-then-mark is
    // O(occurrences), so every non-first doc gets exactly one leading
    // boilerplate span. Asserted EXACTLY, not just timed.
    val megaN = 200000L
    val mega = spark.range(megaN).select(col("id").as("doc_id"),
      concat(
        lit("SHARED-BOILERPLATE-BLOCK-ABCDEFGHIJKLMNOPQRSTUVWXYZ-0123456789-COMMON-HDR "),
        md5(col("id").cast("string")), lit(" "),
        md5((col("id") + 7).cast("string"))).as("text"))
      .repartition(cpus)
    mega.write.mode("overwrite").parquet(s"$root/mega")
    val megaDocs = spark.read.parquet(s"$root/mega")
    (1 to rounds).foreach { _ =>
      val (w, n) = ProbeHarness.time(
        Dedup.exactSubstringSpans(megaDocs, L)
          .where(col("span_start") === 1).count())
      println(f"[substrprobe] mega-group (${megaN}%d docs sharing one block): " +
        f"$n%d leading spans in $w%.1f s")
      require(n == megaN - 1,
        s"exactly every non-first doc must carry one leading boilerplate span, got $n")
    }
    spark.stop()
  }
}
