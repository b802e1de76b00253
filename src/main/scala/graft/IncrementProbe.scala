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
  * Usage: runMain graft.IncrementProbe <sfDir>
  * (point sfDir at a ScaleGen scale-docs output for the 10× corpus)
  */
object IncrementProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IncrementProbe <sfDir>")
    val dir = args(0)
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
    Dedup.exact(existing).select(col("h"), col("keep_id"))
      .write.mode("overwrite").bucketBy(32, "h").sortBy("h").saveAsTable("keeps_b")
    batch.select(md5(col("text")).as("h"), col("doc_id"))
      .write.mode("overwrite").bucketBy(32, "h").sortBy("h").saveAsTable("batch_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val inc = Dedup.exactIncrementHashed(
        spark.table("keeps_b"), spark.table("batch_b"))
      val t0 = System.nanoTime()
      val n = inc.count()
      val bucketedSec = (System.nanoTime() - t0) / 1e9
      val plan = inc.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"),
        "bucketed increment must plan with zero exchanges:\n" + plan.take(3000))
      // same answer and cost comparison vs the shuffled (unbucketed) form
      val t1 = System.nanoTime()
      val m = Dedup.exactIncrement(Dedup.exact(existing), batch).count()
      val shuffledSec = (System.nanoTime() - t1) / 1e9
      assert(n == m, s"bucketed ($n) and shuffled ($m) increments disagree")
      println(f"[incrementprobe] batch=${batch.count()}%d extends=$n%d " +
        f"bucketed=$bucketedSec%.2f s (zero exchanges) shuffled=$shuffledSec%.2f s")
    } finally {
      spark.sql("DROP TABLE IF EXISTS keeps_b")
      spark.sql("DROP TABLE IF EXISTS batch_b")
      spark.stop()
    }
  }
}
