package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared scaffolding for the A/B probe mains (`CrossProbe`,
  * `ClusterProbe`, ...): one session recipe, one wall-clock helper, one
  * synthetic-batch construction — so the bench-noise discipline (warmed,
  * interleaved, same-session arms) is applied in ONE place and cannot
  * drift between probes. */
object ProbeHarness {

  /** The probe session: local[cpus], matching shuffle partitions, UTC, no
    * UI, ERROR logs — identical across every probe main so timings are
    * comparable between them. */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Wall-clock one evaluation. */
  def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  /** Synthetic arriving batch: `batchPct`% of the corpus as near-copies
    * (appended token, ids shifted out of the corpus key space) — dup-dense
    * against the standing side, the operational worst case for scoring
    * joins. `% 100 < pct` keeps the fraction exact for any pct in
    * [1, 100]. */
  def syntheticBatch(corpus: DataFrame, batchPct: Int): DataFrame = {
    require(batchPct >= 1 && batchPct <= 100, s"batchPct $batchPct not in [1, 100]")
    corpus.where(col("doc_id") % 100 < batchPct)
      .select((col("doc_id") + 50000000L).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text"))
  }
}
