package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Demonstrates the `exactIncrement` zero-exchange storage layout at scale
  * (the claim's spec lock is BucketedJoinSpec on toy tables; this probe
  * runs it on a real corpus): the existing keep-set and an incoming
  * pre-hashed batch are both written bucketed by `h` with the same bucket
  * count, and the whole increment — batch min-aggregate + anti-join —
  * must plan with ZERO Exchange nodes (hard assert, so running the probe
  * IS the check), producing the same keep-extension as the shuffled form.
  *
  * Timing discipline: both arms are warmed once (codegen/JIT/page cache),
  * then timed INTERLEAVED over `rounds` rounds — the same shape as
  * `MinhashProbe`, and for the same reason: a fixed bucketed-then-plain
  * order hands the second arm a warmed cache, and sub-second deltas on
  * this host flip direction run-to-run (the repo's own noise discipline
  * refuses <2 s attributions from one-shot numbers).
  *
  * Usage: runMain graft.IncrementProbe <sfDir> [rounds]
  * (point sfDir at a ScaleGen scale-docs output for the 10× corpus)
  */
object IncrementProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IncrementProbe <sfDir> [rounds]")
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, dir, "documents")
    // 90/10 split: the 90% side seeds the keep-set, the 10% side is the
    // incoming batch (dup-dense corpora make the anti-join actually drop).
    val existing = docs.where(col("doc_id") % 10 =!= 0)
    val batch = docs.where(col("doc_id") % 10 === 0)
    // BOTH arms read the same pre-materialized (h, ...) tables — the only
    // difference is the storage layout (bucketed vs plain), so the timed
    // delta isolates the exchange cost. An earlier cut timed
    // `exactIncrement(Dedup.exact(existing), batch)` as the shuffled arm,
    // which charged the whole O(corpus) keep-set construction to it —
    // a review caught the asymmetry.
    val keeps = Dedup.exact(existing).select(col("h"), col("keep_id"))
    val hashedBatch = batch.select(md5(col("text")).as("h"), col("doc_id"))
    keeps.write.mode("overwrite").bucketBy(32, "h").sortBy("h").saveAsTable("keeps_b")
    hashedBatch.write.mode("overwrite").bucketBy(32, "h").sortBy("h").saveAsTable("batch_b")
    keeps.write.mode("overwrite").saveAsTable("keeps_p")
    hashedBatch.write.mode("overwrite").saveAsTable("batch_p")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val inc = Dedup.exactIncrementHashed(
        spark.table("keeps_b"), spark.table("batch_b"))
      val plan = inc.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"),
        "bucketed increment must plan with zero exchanges:\n" + plan.take(3000))
      // identical computation over the PLAIN layout: exchanges re-appear
      val shuffled = Dedup.exactIncrementHashed(
        spark.table("keeps_p"), spark.table("batch_p"))
      val shuffledPlan = shuffled.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(shuffledPlan.contains("Exchange"),
        "plain-layout arm should shuffle; A/B is meaningless otherwise")
      def time(df: org.apache.spark.sql.DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = df.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      // warm both arms once, then interleave timed rounds
      val (_, n) = time(inc)
      val (_, m) = time(shuffled)
      assert(n == m, s"bucketed ($n) and shuffled ($m) increments disagree")
      println(s"[incrementprobe] batch=${batch.count()} extends=$n " +
        "(bucketed arm plans zero exchanges; plain arm shuffles)")
      for (r <- 1 to rounds) {
        val (tb, _) = time(inc)
        val (tp, _) = time(shuffled)
        println(f"[incrementprobe] round $r: bucketed $tb%.2f s  plain $tp%.2f s")
      }
    } finally {
      Seq("keeps_b", "batch_b", "keeps_p", "batch_p")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.stop()
    }
  }
}
