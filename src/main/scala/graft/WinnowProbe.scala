package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Book-length-text probe for the winnowing fingerprinter (VERDICT r9
  * stretch #8). Three arms: the native one-pass `winnow_fps` expression
  * (the default `winnowedFingerprints` path), the original nested-HOF SQL
  * form, and the explode+window SQL re-formulation. The probe's first run
  * measured BOTH SQL forms quadratic in text length (5 KB 1.7 s → 25 KB
  * 32 s → 50 KB 120 s; identical between them) — the cliff is
  * `substring(text, i, k)`'s per-call byte-walk from position 0, not HOF
  * interpretation — which is why the native expression now exists; this
  * probe is the keeper of that measurement.
  *
  * Probe discipline learned the hard way (first cut, kept for the
  * record): (1) sf0.01's documents.parquet is ONE file → one partition →
  * a direct projection call measures a single core while 31 idle — the
  * corpus is repartitioned to the session's cores here (catalog queries
  * never hit this: their upstream joins re-shuffle first); (2) naive
  * text inflation by repeating the same base text collapses under
  * `array_distinct` (16× chars yielded only 89 fps/doc — repeated
  * windows, repeated minima), so segments here are md5-chains seeded
  * from (text, segment index): every 32-char window is distinct, fps
  * grow ~len/w like real prose; (3) inflation is materialized to parquet
  * FIRST so lazy corpus construction never pollutes the timed run.
  *
  * Each doc's text = `segs` space-joined 32-char md5 segments (~33 chars
  * each). Docs with `doc_id % 10 == 0` share a fixed 10-segment leading
  * passage, so the full `substringDupPairs` run at the top length has a
  * real pair join to do (50 docs sharing ~20 fps → C(50,2) pairs).
  *
  * Usage: runMain graft.WinnowProbe <sfDir> [rounds=2] [segs=10,150,750,1500,2400]
  *        (33×segs ≈ chars/doc: 330, 5k, 25k, 50k, 79k)
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: WinnowProbe <sfDir> [rounds] [segs]")
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 2
    val segsList = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
                   else Seq(10, 150, 750, 1500, 2400)
    val spark = ProbeHarness.session()
    val cpus = spark.sparkContext.defaultParallelism
    val root = "/tmp/graft-winnowprobe"

    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val nDocs = base.count()
    println(s"[winnowprobe] $nDocs docs from $dir, $cpus cores")

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
      println(f"[winnowprobe] built segs=$f corpus in $w%.1f s")
    }

    def arm(label: String, f: Int, fn: DataFrame => DataFrame): Unit = {
      val docs = spark.read.parquet(s"$root/segs$f").repartition(cpus)
      val chars = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)
      (1 to rounds).foreach { r =>
        val (w, fps) = ProbeHarness.time(fn(docs).count())
        println(f"[winnowprobe] $label%-8s segs=$f%4d avgLen=${chars / nDocs}%6d " +
          f"fps=$fps%9d (${fps.toDouble / nDocs}%.0f/doc) wall=$w%6.1f s " +
          f"${chars / 1e6 / w}%6.1f MB/s" + (if (r > 1) " (rerun)" else ""))
      }
    }

    segsList.foreach { f =>
      arm("native", f, d => Dedup.winnowedFingerprints(d))
      // The SQL formulations are O(len²) per doc (the substring byte-walk
      // — see winnowedFingerprintsSql scaladoc); measuring them past ~25 KB
      // docs re-demonstrates a known quadratic for minutes, so cap them.
      if (f <= 750) {
        arm("nestedSql", f, d => Dedup.winnowedFingerprintsSql(d))
        arm("exploded", f, d => Dedup.winnowedFingerprintsExploded(d))
      } else println(s"[winnowprobe] segs=$f: SQL arms skipped (measured quadratic)")
    }

    // Equality spot-check at probe scale (the unit spec pins it at test
    // scale): same (doc_id, fp) set from the native expression and a SQL
    // formulation, at the largest length the SQL form can stomach.
    val fEq = segsList.filter(_ <= 750).max
    val eqDocs = spark.read.parquet(s"$root/segs$fEq")
    val a = Dedup.winnowedFingerprints(eqDocs)
    val b = Dedup.winnowedFingerprintsExploded(eqDocs)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[winnowprobe] formulation diff rows at segs=$fEq: $diff (must be 0)")
    require(diff == 0, "winnowedFingerprints formulations disagree")

    val fTop = segsList.max
    val topDocs = spark.read.parquet(s"$root/segs$fTop")

    // Full operator at the top length: fingerprint projection + fp-bucket
    // pair join + shared-count aggregate, all at book length.
    (1 to rounds).foreach { _ =>
      val (w, n) = ProbeHarness.time(
        Dedup.substringDupPairs(topDocs.repartition(cpus)).count())
      println(f"[winnowprobe] substringDupPairs at segs=$fTop: $n%d pairs in $w%.1f s")
    }
    spark.stop()
  }
}
