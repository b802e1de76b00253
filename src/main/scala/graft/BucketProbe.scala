package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSH bucket-occupancy probe for the embedding near-dup path: histogram
  * of bucket sizes at a given plane count plus the implied candidate-pair
  * count (Σ k·(k−1)/2 within buckets, ×17 Hamming-1 probes upper bound) —
  * the number that must stay near-linear for `bucketedNearDup` to scale.
  * Usage: runMain graft.BucketProbe <sfDir> [numPlanes]
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BucketProbe <sfDir> [numPlanes]")
    val dir = args(0)
    val planes = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, dir, "embeddings")
    val sizes = Similarity.lshBuckets(e, planes)
      .groupBy(col("bucket")).agg(count(lit(1)).as("k"))
      .cache()
    val stats = sizes.agg(
      count(lit(1)).as("n_buckets"), max(col("k")).as("max_k"),
      sum(col("k") * (col("k") - 1) / 2).as("within_pairs")).collect()(0)
    val top = sizes.orderBy(col("k").desc).limit(10).collect()
      .map(r => r.getLong(1)).mkString(",")
    println(s"[bucketprobe] planes=$planes vectors=${e.count()} " +
      s"buckets=${stats.getLong(0)} max_bucket=${stats.getLong(1)} " +
      s"within_pairs=${stats.getAs[java.math.BigDecimal](2)} top10=$top")
    sizes.unpersist()
    spark.stop()
  }
}
