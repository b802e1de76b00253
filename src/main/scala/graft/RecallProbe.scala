package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN recall probe: recall@10 vs the exact brute-force baseline for the
  * seed-centroid IVF and 1..N Lloyd-trained refinements, across a sweep of
  * nProbe — the measurement behind the `sim_recall_trained` gate's floor.
  * Usage: RecallProbe <sfDir> [maxIters]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RecallProbe <sfDir> [maxIters]")
    val dir = args(0)
    val maxIters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, dir, "embeddings").cache()
    e.count()
    val q = e.where(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .head().getSeq[Double](0)
    val brute = Similarity.bruteForceTopK(e, q, 10).select(col("vec_id")).cache()
    brute.count()
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      brute.join(df.select(col("vec_id")), "vec_id").count() / 10.0
    // Train ONCE, incrementally: Lloyd refinement is independent of nProbe
    // and iteration k's centroids extend iteration k−1's — so maxIters
    // refine passes total, searched at every (iters, nProbe) combination.
    // (A first cut called ivfTopKTrained per combination: 3×(1+2+3) = 18
    // full-corpus refine aggregates where 3 suffice — a review caught it.)
    val qArr = q.toArray
    val centsByIter = Iterator.iterate(Similarity.centroidsOf(e, 16))(
      Similarity.refineCentroids(e, _)).take(maxIters + 1).toVector
    for (nProbe <- Seq(2, 4, 6)) {
      val seed = recall(Similarity.searchWithCents(e, centsByIter(0), qArr, 10, nProbe))
      val trained = (1 to maxIters).map(it =>
        recall(Similarity.searchWithCents(e, centsByIter(it), qArr, 10, nProbe)))
      println(s"[recallprobe] nProbe=$nProbe seed=$seed trained=${trained.mkString(",")}")
    }
    e.unpersist(); brute.unpersist()
    spark.stop()
  }
}
