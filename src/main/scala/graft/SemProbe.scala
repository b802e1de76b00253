package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Mega-copy skew probe for semantic dedup (the vector-space twin of
  * `SkewProbe`): embeddings ∪ `copies` exact copies of one vector, then
  * `semanticDedup` — the dedup-first rep prelude must keep the mega group
  * OUT of the within-cell pair join (naively it alone is copies²/2
  * pairs). Reports wall time, survivor accounting, and the distinct-rep
  * count that actually reached the join.
  *
  * Usage: runMain graft.SemProbe <sfDir> [copies]
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SemProbe <sfDir> [copies]")
    val dir = args(0)
    val copies = if (args.length > 1) args(1).toInt else 100000
    val spark = ProbeHarness.session()
    import spark.implicits._

    val base = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val src = base.where(col("vec_id") === 7)
    val mega = src.crossJoin(
        spark.range(1, copies + 1).select(col("id")))
      .select((col("id") + 20000000L).as("vec_id"), col("embedding"))
    val corpus = base.unionAll(mega)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBase = base.count(); val nAll = corpus.count()

    val (sec, labeled) = ProbeHarness.time {
      val l = Similarity.semanticDedup(corpus, 0.9)
      (l.count(), l)
    }
    val l = labeled._2
    val megaKept = l.where(col("vec_id") >= 20000000L && col("kept") === 1).count()
    val srcKept = l.where(col("vec_id") === 7).select(col("kept")).as[Int].head()
    val kept = l.where(col("kept") === 1).count()
    val distinctReps = corpus
      .select(md5(expr("CAST(transform(embedding, x -> CAST(x AS DOUBLE)) AS STRING)")).as("vh"))
      .distinct().count()
    println(f"[semprobe] base=$nBase%d copies=$copies%d corpus=$nAll%d wall=$sec%.1f s")
    println(s"[semprobe] kept=$kept mega_copies_kept=$megaKept (required 0; " +
      s"source vec 7 kept=$srcKept) reps_reaching_pair_join=$distinctReps " +
      s"naive_megagroup_pairs=${copies.toLong * (copies.toLong - 1) / 2}")
    assert(megaKept == 0, "every exact mega-copy must drop")
    corpus.unpersist()
    spark.stop()
  }
}
