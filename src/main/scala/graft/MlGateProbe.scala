package graft

import graft.operators.LangModelMl
import org.apache.spark.sql.functions._

/** Cut-margin measurement for the per-language LM gates (r17): prints,
  * per language and per planted stratum (originals vs ASCII-spam twins),
  * the min/max cross-entropy under the stratum's own-language model for
  * BOTH multilingual fixtures (`txt_lm_gate_ml`'s plain plant and
  * `cur_release`'s PII-planted corpus) — the evidence behind the
  * committed `mlGateCut` / `relGateCut` constants. A cut is valid only
  * if max(originals) < cut < min(twins) with margin in EVERY language at
  * EVERY checked scale factor (run at sf0.01 AND sf0.001).
  *
  * Usage: runMain graft.MlGateProbe <sfDir>
  */
object MlGateProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MlGateProbe <sfDir>")
    val spark = ProbeHarness.session()
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("text"),
        graft.operators.TextAnalysis.langIdPred(col("text")).as("lang"))
    val ided = {
      val (t, c) = ModelQueries.releaseIdedFixture(spark, args(0))
      (keyed(t), keyed(c))
    }
    Seq("plain" -> ModelQueries.mlGateFixture(spark, args(0)),
        "pii" -> ModelQueries.releaseFixture(spark, args(0)),
        "ided" -> ided).foreach {
      case (name, (train, corpus)) =>
        val uni = LangModelMl.unigramCountsMl(train)
        val bi = LangModelMl.bigramCountsMl(train)
        val base = LangModelMl.calibratedCutsMl(train, uni, bi, 0L)
        // strata live in 10e6 blocks per script (base, ko +10e6, ru
        // +20e6 — r18); within each block the derived offsets are the
        // fixture scheme: orig < 1e6, twin [1e6, 2e6)
        val off = col("doc_id") % 10000000L
        val scored = LangModelMl
          .scoreWithMl(corpus.where(off < 2000000L), uni, bi)
          .withColumn("stratum",
            when(col("doc_id") % 10000000L >= 1000000L, lit("twin"))
              .otherwise(lit("orig")))
          .withColumn("micro", round(col("xent") * 1e6).cast("long"))
          .join(base, Seq("lang"))
        println(s"[mlgate] fixture=$name  " +
          "(valid offset window = (max orig_above, min twin_above) over langs)")
        val rows = scored.groupBy(col("lang"), col("stratum"))
          .agg(count(lit(1)).as("n"),
            max(col("micro") - col("cut_micro")).as("max_above"),
            min(col("micro") - col("cut_micro")).as("min_above"))
          .orderBy(col("lang"), col("stratum"))
          .collect()
        rows.foreach(r => println(s"[mlgate]   $r"))
        val origMax = rows.filter(_.getString(1) == "orig")
          .map(_.getLong(3)).max
        val twinMin = rows.filter(_.getString(1) == "twin")
          .map(_.getLong(4)).min
        println(s"[mlgate]   window: offsetMicro in ($origMax, $twinMin)" +
          (if (origMax < twinMin) "  OK" else "  EMPTY — no separating offset"))
    }
    // ORDER-5 arms (r19): cur_release5 / cur_release5_ided calibrate
    // their cuts on order-5 self-scores — lower and tighter than
    // order-2, so the offset windows are measured separately on the
    // exact fixtures at the exact order (ided5 = prediction-keyed).
    Seq("pii5" -> ModelQueries.releaseFixture(spark, args(0)),
        "ided5" -> ided).foreach {
      case (name, (train, corpus)) =>
        val tables = (1 to 5).map(k =>
          LangModelMl.gramCountsMl(train, k).localCheckpoint(true))
        val base = LangModelMl.cutsFromSelfScores(
          LangModelMl.scoreStreamNMl(train, tables, 5), 0L)
        val off = col("doc_id") % 10000000L
        val scored = LangModelMl
          .scoreStreamNMl(corpus.where(off < 2000000L), tables, 5)
          .withColumn("stratum",
            when(col("doc_id") % 10000000L >= 1000000L, lit("twin"))
              .otherwise(lit("orig")))
          .withColumn("micro", round(col("xent") * 1e6).cast("long"))
          .join(base, Seq("lang"))
        println(s"[mlgate] fixture=$name (ORDER 5)")
        val rows = scored.groupBy(col("lang"), col("stratum"))
          .agg(count(lit(1)).as("n"),
            max(col("micro") - col("cut_micro")).as("max_above"),
            min(col("micro") - col("cut_micro")).as("min_above"))
          .orderBy(col("lang"), col("stratum"))
          .collect()
        rows.foreach(r => println(s"[mlgate]   $r"))
        val origMax = rows.filter(_.getString(1) == "orig")
          .map(_.getLong(3)).max
        val twinMin = rows.filter(_.getString(1) == "twin")
          .map(_.getLong(4)).min
        println(s"[mlgate]   window: offsetMicro in ($origMax, $twinMin)" +
          (if (origMax < twinMin) "  OK" else "  EMPTY — no separating offset"))
    }
    spark.stop()
  }
}
