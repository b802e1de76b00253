package graft

import graft.operators.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned-write skew probe (round 13): measures the trade documented at
  * `Layout.binnedZorderWrite` — the deterministic static grid (`fid` =
  * top bits of the curve value) buys replayable, engine-independent file
  * assignment at the cost of bins tracking KEY-SPACE DENSITY: skewed
  * keys coarsen hot cells exactly like a zone map, where
  * `repartitionByRange`'s sampled boundaries would balance file SIZES
  * instead.
  *
  * Both layouts are written from the same corpus under a uniform and a
  * skewed (squared-rank) key distribution; reported per arm:
  *   - rows-per-file p50 / max (the skew cost is the max/p50 ratio)
  *   - files overlapping a hot-range predicate box, and the row fraction
  *     those files hold (what a pruning reader actually scans)
  *
  * Usage: runMain graft.BinSkewProbe <sfDir> [bins=64]
  */
object BinSkewProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BinSkewProbe <sfDir> [bins]")
    val dir = args(0)
    val bins = if (args.length > 1) args(1).toInt else 64
    val spark = ProbeHarness.session()
    import spark.implicits._
    val root = "/tmp/graft-binskewprobe"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val li = Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val n = li.count()
    val maxPk = li.agg(max(col("l_partkey"))).as[Long].head()
    // skew arm: squared rank concentrates ~all mass in the top key range
    val skewed = li.withColumn("l_partkey",
      (col("l_partkey") * col("l_partkey") / maxPk).cast("long"))
    println(s"[binskew] $n lineitem rows from $dir, $bins bins; " +
      s"hot box = top 10% of the partkey space")
    // untimed warmup write (JIT/committer setup)
    Layout.binnedZorderWrite(li.limit(1000), Seq("l_partkey", "l_suppkey"),
      s"$root/warm", bins = 16)

    def occupancy(d: DataFrame): (Long, Long) = {
      val counts = d.groupBy(col("fid")).agg(count(lit(1)).as("c"))
        .select(col("c")).as[Long].collect().sorted
      (counts(counts.length / 2), counts.last)
    }
    def report(label: String, data: DataFrame): Unit = {
      val bDir = s"$root/$label/binned"
      val rDir = s"$root/$label/ranged"
      val (bSec, _) = ProbeHarness.time {
        Layout.binnedZorderWrite(data, Seq("l_partkey", "l_suppkey"), bDir, bins)
      }
      val (rSec, _) = ProbeHarness.time {
        Layout.zorderWrite(data, Seq("l_partkey", "l_suppkey"), rDir, files = bins)
      }
      val hotLo = (data.agg(max(col("l_partkey"))).as[Long].head() * 0.9).toLong
      val box = Map("l_partkey" -> (hotLo.toDouble, Double.MaxValue))
      val (bP50, bMax) = occupancy(spark.read.parquet(bDir))
      val (bRead, bTot) = Layout.filesOverlapping(
        Layout.binRanges(spark, bDir, Seq("l_partkey", "l_suppkey")), box)
      val hotRows = spark.read.parquet(bDir).where(col("l_partkey") >= hotLo).count()
      val scanned = spark.read.parquet(bDir)
        .join(Layout.binRanges(spark, bDir, Seq("l_partkey", "l_suppkey"))
          .where(col("mx_l_partkey") >= hotLo).select(col("fid")), "fid")
        .count()
      val rp = Layout.fileRanges(spark, rDir, Seq("l_partkey", "l_suppkey"))
      val (rRead, rTot) = Layout.filesOverlapping(rp, box)
      val rCounts = spark.read.parquet(rDir)
        .groupBy(input_file_name()).agg(count(lit(1)).as("c"))
        .select(col("c")).as[Long].collect().sorted
      println(f"[binskew] $label%-7s binned: write $bSec%5.2f s, rows/bin " +
        f"p50=$bP50%7d max=$bMax%8d (${bMax.toDouble / bP50}%5.1fx), " +
        f"hot box reads $bRead/$bTot bins = $scanned%8d rows for $hotRows%7d hits")
      println(f"[binskew] $label%-7s ranged: write $rSec%5.2f s, rows/file " +
        f"p50=${rCounts(rCounts.length / 2)}%7d max=${rCounts.last}%8d " +
        f"(${rCounts.last.toDouble / rCounts(rCounts.length / 2)}%5.1fx), " +
        f"hot box reads $rRead/$rTot files")
    }
    report("uniform", li)
    report("skewed", skewed)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
