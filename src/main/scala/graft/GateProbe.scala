package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-gate A/B for the edit-distance chain on a dup-dense corpus
  * (point sfDir at a ScaleGen scale-docs output for the 10× corpus).
  *
  * Both arms run DEDUP-FIRST over the same planted-near corpus (the
  * dd_edit fixture) in one warmed session, interleaved over `rounds` so a
  * contention window hits both arms:
  *   A: `lshCandidatePairsDedup` → `editSimilarity` (all candidates DP'd,
  *      the dd_edit shape);
  *   B: `editSimilarityGated` (minhash seed-agreement ≥ 4/8, then the
  *      length bound + 0.5 floor ahead of the DP — the dd_edit_gated
  *      shape).
  * Reports the rep-level candidate pair count, the post-agreement count
  * (= the DPs arm B actually runs, up to the length-bound cut), both
  * arms' output rows, and per-round walls. The gate's claim is the DP
  * count cut with near-dups retained — wall time at this corpus size is
  * dominated by fixed chain overhead, and says so here honestly.
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GateProbe <sfDir> [rounds] [textInflate]")
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 2
    // textInflate repeats each text N× (EditProbe's axis): DP cost per
    // pair grows N², chain cost only ~N — the knob that moves a corpus
    // from chain-dominated (gate loses) to DP-dominated (gate wins).
    val inflate = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d0 = Tables(spark, dir, "documents").select(col("doc_id"),
      (if (inflate > 1) expr(s"trim(repeat(concat(text, ' '), $inflate))")
       else col("text")).as("text"))
    // the dd_edit planting: near-copies (appended token) of doc_id < 20
    val corpus = d0.unionAll(d0.where(col("doc_id") < 20)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[gateprobe] corpus=${corpus.count()} docs, " +
      s"distinct=${corpus.select("text").distinct().count()} texts")
    val repPairs = Dedup.lshCandidatePairsDedup(corpus)
    // Rep-level candidate volume vs what survives the agreement gate: the
    // gated output's distinct text pairs = the DPs arm B ran (minus
    // length-bound cuts, which this fixture's near-equal lengths don't
    // trip) — arm A DPs every distinct candidate text pair.
    println(s"[gateprobe] candidate doc pairs=${repPairs.count()}")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[gateprobe]   $label: $n%d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // Raw kernel cost at this text length (folding defeated by the id
    // suffix): per-pair levenshtein is the unit everything above divides by.
    val avgLen = corpus.agg(avg(length(col("text")))).collect()(0).getDouble(0).toInt
    val aText = corpus.where(col("doc_id") === 0).select(col("text")).head().getString(0)
    time(s"LEV micro: 262 pairs at len=$avgLen")(
      spark.range(262)
        .select(levenshtein(concat(lit(aText), col("id").cast("string")),
          concat(lit(aText.reverse), col("id").cast("string"))).as("d"))
        .agg(sum(col("d"))).count())
    (1 to rounds).foreach { r =>
      println(s"[gateprobe] round $r")
      time("A1 lshCandidatePairsDedup")(Dedup.lshCandidatePairsDedup(corpus).count())
      time("A editSimilarity(all candidates)")(
        Dedup.editSimilarity(corpus, Dedup.lshCandidatePairsDedup(corpus)).count())
      time("B0 agreementGatedPairs")(
        Dedup.agreementGatedPairs(corpus, minAgree = 4).count())
      val agreed = Dedup.agreementGatedPairs(corpus, minAgree = 4)
      time("B1u editSimilarity(gated pairs, NO floor)")(
        Dedup.editSimilarity(corpus, agreed).count())
      if (sys.env.contains("GATEPROBE_ISOLATE")) {
        // hand-built replicas of editSimilarity's internal stages, LAZY,
        // to bisect the floored path's cost without the eager checkpoint
        val candDocs = agreed.select(col("doc_a").as("doc_id"))
          .union(agreed.select(col("doc_b").as("doc_id"))).distinct()
        val cand = corpus.join(candDocs, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), md5(col("text")).as("h"), col("text"))
        val texts = cand.select(col("h"), col("text")).dropDuplicates("h")
        val idHash = cand.select(col("doc_id"), col("h"))
        val keyed = agreed
          .join(idHash.select(col("doc_id").as("doc_a"), col("h").as("ha")), "doc_a")
          .join(idHash.select(col("doc_id").as("doc_b"), col("h").as("hb")), "doc_b")
          .select(col("doc_a"), col("doc_b"), col("ha"), col("hb"))
        val distinctPairs = keyed.select(col("ha"), col("hb")).distinct()
        val lens = texts.select(col("h"), length(col("text")).cast("long").as("len"))
        val lev = when(col("ta") === col("tb"), lit(0L))
          .otherwise(levenshtein(col("ta"), col("tb")).cast("long"))
        def score(pairs0: org.apache.spark.sql.DataFrame) = pairs0
          .join(texts.select(col("h").as("ha"), col("text").as("ta")), "ha")
          .join(texts.select(col("h").as("hb"), col("text").as("tb")), "hb")
          .select(col("ha"), col("hb"), lev.as("edit_dist"),
            round(lit(1.0) - lev.cast("double") /
              greatest(length(col("ta")), length(col("tb"))), 6).as("edit_sim"))
        time("ISO a: score(distinctPairs), no gate no floor")(
          score(distinctPairs).count())
        val bounded = distinctPairs
          .join(lens.select(col("h").as("ha"), col("len").as("la")), "ha")
          .join(lens.select(col("h").as("hb"), col("len").as("lb")), "hb")
          .where(lit(1.0) - abs(col("la") - col("lb")).cast("double") /
            greatest(col("la"), col("lb")) >= lit(0.5 - 1e-6))
          .select(col("ha"), col("hb"))
        time("ISO b: + length-bound gate join")(score(bounded).count())
        time("ISO c: + floor filter only")(
          score(distinctPairs).where(col("edit_sim") >= 0.5).count())
        time("ISO d: gate + floor")(
          score(bounded).where(col("edit_sim") >= 0.5).count())
      }
      time("B1 editSimilarity(gated pairs, floor 0.5)")(
        Dedup.editSimilarity(corpus, agreed, Some(0.5)).count())
      time("B editSimilarityGated(agree>=4, floor 0.5)")(
        Dedup.editSimilarityGated(corpus, minSim = 0.5, minAgree = 4).count())
    }
    spark.stop()
  }
}
