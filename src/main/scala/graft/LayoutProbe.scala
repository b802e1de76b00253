package graft

import graft.operators.Layout
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Makes the Z-order pruning claim observable on REAL parquet metadata and
  * REAL scans (LayoutSpec locks the same invariants on the model
  * arithmetic; `lay_zorder_prune` surfaces it per-round): writes the
  * Z-ordered and linear layouts of lineitem, then
  *
  *   1. walks every file's parquet FOOTER (parquet-hadoop, the same
  *      org.apache.parquet metadata Spark's reader consults) and counts
  *      ROW GROUPS whose [min, max] survive each predicate box — footer
  *      truth, not a model; and
  *   2. times the actual filtered aggregate on each layout, warmed then
  *      interleaved A/B per round (the `ProbeHarness` noise discipline),
  *      so the row-group skipping shows up as wall-clock.
  *
  * Three predicate shapes: leading column only (linear's best case),
  * trailing column only (linear cannot prune AT ALL — its files all span
  * the full trailing range; the Z-curve's win), and the 2-D box. Boxes
  * derive from each column's min/max span, so the probe is scale-factor
  * portable.
  *
  * Usage: runMain graft.LayoutProbe <sfDir> [files] [rounds]
  */
object LayoutProbe {

  private def rowGroupStats(dir: String, box: Map[String, (Double, Double)])
      : (Long, Long) = {
    val conf = new Configuration()
    val fs = new Path(dir).getFileSystem(conf)
    val files = fs.listStatus(new Path(dir))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    var surviving = 0L
    var total = 0L
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        reader.getFooter.getBlocks.forEach { block =>
          total += 1
          val ok = box.forall { case (name, (lo, hi)) =>
            val col = block.getColumns.asScala
              .find(_.getPath.toDotString == name)
              .getOrElse(sys.error(s"column $name not in footer of ${f.getPath}"))
            val st = col.getStatistics
            // no stats -> cannot prune, the row group must be read
            if (st == null || !st.hasNonNullValue) true
            else {
              val mn = st.genericGetMin.asInstanceOf[Number].doubleValue()
              val mx = st.genericGetMax.asInstanceOf[Number].doubleValue()
              mn <= hi && mx >= lo
            }
          }
          if (ok) surviving += 1
        }
      } finally reader.close()
    }
    (surviving, total)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LayoutProbe <sfDir> [files] [rounds]")
    val dir = args(0)
    val nFiles = if (args.length > 1) args(1).toInt else 64
    val rounds = if (args.length > 2) args(2).toInt else 3
    val spark = ProbeHarness.session()
    val zc = Seq("l_partkey", "l_suppkey")
    val li = Tables(spark, dir, "lineitem")
    val Seq(pMn, pMx, sMn, sMx) =
      li.agg(min(col(zc(0))).cast("double"), max(col(zc(0))).cast("double"),
          min(col(zc(1))).cast("double"), max(col(zc(1))).cast("double"))
        .head().toSeq.map(_.asInstanceOf[Double])
    def span(mn: Double, mx: Double, lo: Double, hi: Double) =
      (mn + lo * (mx - mn), mn + hi * (mx - mn))
    val pBox = span(pMn, pMx, 0.05, 0.15) // 10% of the leading column
    val sBox = span(sMn, sMx, 0.05, 0.40) // 35% of the trailing column
    val sNarrow = span(sMn, sMx, 0.50, 0.55) // 5% of the trailing column
    val boxes = Seq(
      "leading_10pct" -> Map(zc(0) -> pBox),
      "trailing_35pct" -> Map(zc(1) -> sBox),
      "trailing_5pct" -> Map(zc(1) -> sNarrow),
      "box_2d" -> Map(zc(0) -> pBox, zc(1) -> sBox))

    val base = java.nio.file.Files.createTempDirectory("graft-lay-probe").toString
    // Untimed warmup writes first — one per ARM, small for the curves:
    // the session's first parquet write pays JIT/committer setup, and
    // each curve's first use pays its generated-class compile; either
    // would land on whichever timed arm runs first (this confounded an
    // early round-10 read of these numbers as a 1.8x Morton-tree
    // penalty).
    Layout.linearWrite(li, zc, s"$base/warm", nFiles)
    val small = li.limit(10000)
    Layout.zorderWrite(small, zc, s"$base/warmz", 2)
    Layout.zorderWrite(small, zc, s"$base/warmh", 2, curve = Layout.Hilbert)
    val (zSec, _) = ProbeHarness.time(
      Layout.zorderWrite(li, zc, s"$base/z", nFiles))
    val (hSec, _) = ProbeHarness.time(
      Layout.zorderWrite(li, zc, s"$base/h", nFiles, curve = Layout.Hilbert))
    val (lSec, _) = ProbeHarness.time(
      Layout.linearWrite(li, zc, s"$base/lin", nFiles))
    val n = li.count()
    println(f"[layprobe] rows=$n%d files=$nFiles%d zorder-write=$zSec%.1f s " +
      f"hilbert-write=$hSec%.1f s linear-write=$lSec%.1f s")

    def scan(d: String, box: Map[String, (Double, Double)]): DataFrame =
      spark.read.parquet(d)
        .where(box.map { case (c, (lo, hi)) => col(c).between(lo, hi) }
          .reduce(_ && _))
        .agg(count(lit(1)), sum(col("l_quantity")))

    for ((pname, box) <- boxes) {
      val (zs, zt) = rowGroupStats(s"$base/z", box)
      val (hs, ht) = rowGroupStats(s"$base/h", box)
      val (ls, lt) = rowGroupStats(s"$base/lin", box)
      // warm all arms, then interleave timed rounds
      scan(s"$base/z", box).collect(); scan(s"$base/h", box).collect()
      scan(s"$base/lin", box).collect()
      val zTimes = Array.newBuilder[Double]
      val hTimes = Array.newBuilder[Double]
      val lTimes = Array.newBuilder[Double]
      (1 to rounds).foreach { _ =>
        zTimes += ProbeHarness.time(scan(s"$base/z", box).collect())._1
        hTimes += ProbeHarness.time(scan(s"$base/h", box).collect())._1
        lTimes += ProbeHarness.time(scan(s"$base/lin", box).collect())._1
      }
      val zm = zTimes.result().min
      val hm = hTimes.result().min
      val lm = lTimes.result().min
      println(f"[layprobe] $pname%-15s zorder: rowgroups $zs%3d/$zt%-3d scan $zm%.3f s | " +
        f"hilbert: rowgroups $hs%3d/$ht%-3d scan $hm%.3f s | " +
        f"linear: rowgroups $ls%3d/$lt%-3d scan $lm%.3f s")
    }
    spark.stop()
  }
}
