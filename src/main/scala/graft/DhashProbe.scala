package graft

import graft.operators.{Dedup, Multimodal}
import graft.operators.MediaRow
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Image near-dedup probe (round 13): measures what MultimodalSpec pins
  * only at fixture scale — the `dHash64` decode+hash kernel's throughput
  * on production-sized payloads, and `nearDupImages`' banded candidate
  * space against the all-pairs counterfactual.
  *
  *   1. Build N real PNG images at `side`×`side` px (every pixel keyed,
  *      `ImageIO`-encoded — the decode is the honest cost, ~`side`² work
  *      per image vs the hash's fixed 81 samples). 10% are planted
  *      near-dups of a base image (+1 uniform brightness → identical
  *      gradient hash).
  *   2. Time `dHash64` end to end (decode + downsample + 64 gradient
  *      bits), warmed: images/s and decoded-MB/s. Narrow map — scaling to
  *      100 TB is executor count, nothing else.
  *   3. Over the REAL hash distribution, count the 16-bit-band candidate
  *      pairs `simhashPairs` actually scores vs n(n−1)/2, and assert
  *      every planted pair is found (the pigeonhole guarantee at
  *      maxHamming ≤ 3).
  *
  * Usage: runMain graft.DhashProbe [n=20000] [side=128] [rounds=3]
  */
object DhashProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val side = if (args.length > 1) args(1).toInt else 128
    val rounds = if (args.length > 2) args(2).toInt else 3
    val spark = ProbeHarness.session()
    import spark.implicits._
    val cpus = spark.sparkContext.defaultParallelism

    // n keyed images; ids >= 10M are +1-brightness twins of id % 10M
    val media: Dataset[MediaRow] = spark.range(n).select(
        when(col("id") % 10 === 9, col("id") - 9 + 10000000L)
          .otherwise(col("id")).as("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val key = id % 10000000L
          val delta = if (id >= 10000000L) 1 else 0
          val img = new java.awt.image.BufferedImage(
            side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
          // splitmix64 per pixel: a LINEAR keyed pattern makes adjacent-
          // pixel gradients key-independent (every image would share one
          // hash); the mix gives each image an i.i.d.-looking 64-bit hash
          def mix(z0: Long): Long = {
            var z = z0 + -7046029254386353131L
            z = (z ^ (z >>> 30)) * -4658895280553007687L
            z = (z ^ (z >>> 27)) * -7723592293110705685L
            z ^ (z >>> 31)
          }
          var y = 0
          while (y < side) {
            var x = 0
            while (x < side) {
              val h = mix(key * 65537L + y.toLong * side + x)
              def v(c: Int): Int =
                ((((h >>> (c * 8)) & 0xff) % 255).toInt + delta).min(255)
              img.setRGB(x, y, (v(0) << 16) | (v(1) << 8) | v(2))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRow(id, "image/png", bos.toByteArray)
        }
      }
      .repartition(cpus).persist()
    val bytes = media.toDF().agg(sum(length(col("content")))).as[Long].head()
    val planted = n / 10
    println(s"[dhashprobe] $n ${side}x$side png images, " +
      f"${bytes / 1e6}%.1f MB encoded, $planted planted +1-brightness twins")

    val secs = (0 to rounds).map { _ =>
      ProbeHarness.time { Multimodal.dHash64(media).agg(count(lit(1))).head() }._1
    }.drop(1) // first run is the warmup
    val best = secs.min
    println(f"[dhashprobe] dHash64 ${secs.map(s => f"$s%.2f").mkString(" ")}s " +
      f"(best $best%.2f s, ${n / best}%.0f img/s, ${bytes / best / 1e6}%.1f MB/s)")

    // banded candidate space over the real hash distribution
    val sigs = Multimodal.dHash64(media)
      .select(col("doc_id"), col("phash").as("sigint")).persist()
    val cand = sigs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, 3), b -> concat(b, ':', (sigint >> (b * 16)) & 65535))"))
        .as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as("c"))
      .agg(sum((col("c") * (col("c") - 1)).cast("long") / lit(2L)).cast("long"))
      .as[Long].head()
    val (pairSec, nPairs) = ProbeHarness.time {
      Dedup.simhashPairs(sigs, maxHamming = 3).count()
    }
    val allPairs = n.toLong * (n - 1) / 2
    println(f"[dhashprobe] banding: $cand banded candidates vs $allPairs " +
      f"all-pairs (${allPairs.toDouble / cand}%.0fx cut); " +
      f"$nPairs pairs <= hamming 3 in $pairSec%.2f s")
    require(nPairs >= planted,
      s"banding must find every planted twin pair: $nPairs < $planted")
    spark.stop()
  }
}
