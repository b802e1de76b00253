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
    Seq("plain" -> ModelQueries.mlGateFixture(spark, args(0)),
        "pii" -> ModelQueries.releaseFixture(spark, args(0))).foreach {
      case (name, (train, corpus)) =>
        val uni = LangModelMl.unigramCountsMl(train)
        val bi = LangModelMl.bigramCountsMl(train)
        val base = LangModelMl.calibratedCutsMl(train, uni, bi, 0L)
        val scored = LangModelMl
          .scoreWithMl(corpus.where(col("doc_id") < 2000000L), uni, bi)
          .withColumn("stratum",
            when(col("doc_id") >= 1000000L, lit("twin")).otherwise(lit("orig")))
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
    spark.stop()
  }
}
