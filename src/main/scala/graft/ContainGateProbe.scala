package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Containment-gate A/B on the dd_containment planted corpus — the
  * GateProbe discipline (one warmed session, arms interleaved per round so
  * a contention window hits both) applied to the overlap-stats scorer:
  *   A: `containmentDedup` (every LSH candidate pair through
  *      `pairOverlapStats`) filtered to `max(cont_a, cont_b) ≥ 0.5` —
  *      the ungated chain doing the gated row's job;
  *   B: `containmentDedupGated(minCont = 0.5, minAgree = 4)` — the
  *      seed-agreement floor cutting the pair spine BEFORE the
  *      intersection join, plus the output floor before expansion.
  *
  * The probe HARD-ASSERTS result identity (gated == floor-filtered
  * ungated, full (pair, cont_a, cont_b) sets) before timing — the
  * empirical form of the contract-boundary claim: at this corpus's
  * size geometry no ≥-0.5-containment pair is asymmetric enough to fail
  * the estimated-Jaccard-0.5 agreement floor. Reports the rep-level
  * candidate count vs the post-agreement count (the intersection-join
  * spine cut, the gate's actual claim) and per-round walls.
  */
object ContainGateProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ContainGateProbe <sfDir> [rounds]")
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d0 = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    // the dd_containment planting: near-copies (appended token) of doc_id < 20
    val corpus = d0.unionAll(d0.where(col("doc_id") < 20)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[containgate] corpus=${corpus.count()} docs")
    val repPairs = Dedup.lshCandidatePairsDedup(corpus)
    println(s"[containgate] candidate doc pairs=${repPairs.count()}")
    println(s"[containgate] post-agreement rep pairs=" +
      s"${Dedup.agreementGatedPairs(corpus, minAgree = 4).count()}")

    // Identity first: the gate must not change the thresholded answer.
    val floor = greatest(col("cont_a"), col("cont_b")) >= 0.5
    val a = Dedup.containmentDedup(corpus).where(floor)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    val b = Dedup.containmentDedupGated(corpus, minCont = 0.5, minAgree = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    require(a == b, s"gated != floor-filtered ungated: " +
      s"only-ungated=${(a -- b).take(5)} only-gated=${(b -- a).take(5)}")
    println(s"[containgate] identity OK: ${a.size} pairs above the 0.5 floor")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[containgate]   $label: $n%d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    (1 to rounds).foreach { r =>
      println(s"[containgate] round $r")
      time("A containmentDedup (all candidates scored)")(
        Dedup.containmentDedup(corpus).count())
      time("A+floor (the gated row's job, ungated chain)")(
        Dedup.containmentDedup(corpus).where(floor).count())
      time("B containmentDedupGated")(
        Dedup.containmentDedupGated(corpus, minCont = 0.5, minAgree = 4).count())
    }
    corpus.unpersist()
    spark.stop()
  }
}
