package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the editSimilarity exchange shape:
  * `runMain graft.EditProbe <sfDir> [inflate]` — dup-dense corpus with
  * texts inflated ~inflate× (repeat), candidate pairs computed once, then
  * the scorer timed alone. Swap the editSimilarity body (git show an old
  * rev) to A/B implementations on the same corpus in the same session.
  * Round-7 result: hash-keyed vs text-carrying distinct measured 3.7 vs
  * 3.8 s at 50k docs / 1.2 KB texts / 301k pairs — indistinguishable on a
  * single JVM whose "exchange" is memory bandwidth; the shape choice is
  * motivated by network-shuffle byte volume, not local wall time. */
object EditProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EditProbe <sfDir> [inflate]")
    val dir = args(0)
    val inflate = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr(s"trim(repeat(concat(text, ' '), $inflate))").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val avgLen = corpus.agg(avg(length(col("text")))).collect()(0).getDouble(0)
    val pairs = Dedup.lshCandidatePairsDedup(corpus)
    println(s"[editprobe] docs=${corpus.count()} avg_text_len=${avgLen.toInt} pairs=${pairs.count()}")
    val t0 = System.nanoTime()
    val n = Dedup.editSimilarity(corpus, pairs).count()
    println(f"[editprobe] editSimilarity: $n%d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
