package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-session A/B of the minhash base-hash width (r7 widening,
  * `Dedup.shingleBaseHash`): times `lshCandidatePairsFromShingles` with the
  * pre-r7 7-hex base (universe 2²⁸) and the current 15-hex base (≈2³¹)
  * over ONE persisted shingle set, interleaved A/B/A/B so a contention
  * window hits both arms — full-catalog totals drift ±20% between
  * identical runs here, so only an interleaved same-session probe can
  * attribute a per-query delta to this change.
  *
  * Usage: runMain graft.MinhashProbe <sfDir> [rounds]
  * (point sfDir at a ScaleGen scale-docs output for the 10× corpus)
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MinhashProbe <sfDir> [rounds]")
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
    val sh = Dedup.shingles(docs, 3, dedup = false)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[minhashprobe] docs=${docs.count()} shingle_rows=${sh.count()}")
    def time(width: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = Dedup.lshCandidatePairsFromShingles(sh, 8, 2, 1000, baseHexWidth = width).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm both arms once (codegen/JIT), then interleave timed rounds
    time(7); time(15)
    for (r <- 1 to rounds) {
      val (t7, n7) = time(7)
      val (t15, n15) = time(15)
      println(f"[minhashprobe] round $r: 7-hex $t7%.2f s ($n7%d pairs)  15-hex $t15%.2f s ($n15%d pairs)")
    }
    sh.unpersist()
    spark.stop()
  }
}
