package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mega-group skew probe: `runMain graft.SkewProbe <sfDir> [copies]`.
  *
  * The dedup-first chain's single guard against k² candidate blowup is the
  * mega-group cap (`Dedup.dedupPrelude`: text groups above `maxBucket`
  * copies emit no pairs and never enter the LSH graph). This probe
  * exercises the cap far beyond spec scale: the corpus is the sf
  * `documents` table PLUS one text at `copies` (default 100,000) exact
  * copies PLUS a 20%-of-docs near-dup background (appended-token twins,
  * the `plantedNear` pattern). Uncapped, the mega-group alone would emit
  * ~copies²/2 ≈ 5×10⁹ pairs; capped, the candidate join must stay at
  * background scale and the wall time within a small factor of the plain
  * sf0.1 run. Prints one summary line per operator for EXPLAIN.md.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SkewProbe <sfDir> [copies]")
    val dir = args(0)
    val copies = if (args.length > 1) args(1).toLong else 100000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val nDocs = base.count()
    // Guard the probe's corpus assumptions LOUDLY — a missing doc 0 would
    // make the mega group empty (the must-be-0 control passing vacuously),
    // and base ids reaching the planted ranges would alias planted docs.
    // (nDocs first: max over an empty table is a null, not a message.)
    require(nDocs > 0, s"documents table at $dir is empty")
    val maxId = base.agg(max(col("doc_id"))).collect()(0).getLong(0)
    require(maxId < 10000000L,
      s"documents max doc_id $maxId reaches the planted id ranges (10M/20M)")
    // One text at `copies` exact copies (ids 20M+), disjoint from real ids.
    val megaText = base.where(col("doc_id") === 0).select(col("text"))
    require(megaText.count() == 1,
      "probe needs exactly one doc with doc_id 0 to replicate")
    val mega = spark.range(copies).crossJoin(megaText)
      .select((col("id") + 20000000L).as("doc_id"), col("text"))
    // Near-dup background: every 5th doc gets an appended-token twin.
    val near = base.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text"))
    val corpus = base.unionAll(near).unionAll(mega)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[skewprobe] corpus: ${corpus.count()} docs " +
      s"($nDocs base + ${near.count()} near-dups + $copies mega-copies)")

    // No clearCache between measurements: the corpus persist above must
    // survive both operators (clearing would silently fold a corpus
    // rebuild into the second measurement).
    def timed[A](name: String)(f: => (A, Long)): A = {
      val t0 = System.nanoTime()
      val (a, n) = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[skewprobe] $name: $n%d rows in $sec%.1f s")
      a
    }
    // The composition whose super-linear stages the cap protects
    // (dd_pipeline's core), then cluster formation over the same graph.
    // The operator is CONSTRUCTED inside the timer (it materializes its
    // result eagerly); the returned checkpoint-backed frame is reused for
    // the control below instead of running the whole chain again.
    val scores = timed("nearDupScores") {
      val s = Dedup.nearDupScores(corpus); (s, s.count())
    }
    timed("clusterDedupFirst") {
      val c = Dedup.clusterDedupFirst(corpus); (c, c.count())
    }
    // Control: the mega-group must be absent from pair output entirely.
    val megaPairs = scores
      .where(col("doc_a") >= 20000000L || col("doc_b") >= 20000000L).count()
    println(s"[skewprobe] mega-group pairs in output: $megaPairs (must be 0)")
    spark.stop()
  }
}
