package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents(doc_id, text, ...)` — language
  * ID, quality scoring, token counting, fingerprinting (north-star surface,
  * `BASELINE.json:6`). All scoring is integer/ratio arithmetic over string
  * ops, so every result is bit-reproducible in the DuckDB oracle.
  *
  * Everything here is a narrow per-row projection (no shuffle) except the
  * final aggregations — exactly the shape that scales linearly to 100 TB.
  */
object TextAnalysis {

  /** Deterministic keyword profiles for the heuristic language classifier.
    * (Real-world n-gram profiles plug into the same argmax; the synthetic
    * corpus shares one vocabulary, so profiles are drawn from it.) */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("table", "join", "merge", "group"),
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "row", "stream", "big"),
    "fr" -> Seq("window", "query", "agg", "line"))

  private def toks: Column = split(col("text"), " ")

  /** Count of tokens of `text` that appear in `words`. */
  private def profileScoreOf(text: Column, words: Seq[String]): Column =
    size(filter(split(text, " "), t => t.isin(words.map(lit): _*)))

  /** The word-profile argmax as a Column: array_max on (score, code)
    * structs picks highest score; for equal scores the LEXICOGRAPHICALLY
    * LARGEST code wins — mirrored in the oracle's max_by ordering. */
  private def profileArgmaxOf(text: Column): Column = {
    val scored = langProfiles.map { case (code, words) =>
      struct(profileScoreOf(text, words).as("score"), lit(code).as("code"))
    }
    array_max(array(scored: _*)).getField("code")
  }

  private def profileArgmax: Column = profileArgmaxOf(col("text"))

  /** Per-document predicted language: argmax profile score, ties broken by
    * language code order (deterministic). */
  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), profileArgmax.as("pred_lang"))

  /** Script classes for [[langIdMl]] — literal BMP ranges, the
    * [[LangModelMl.mlTokenClass]] cross-engine discipline. */
  val kanaClass: String = "[\u3040-\u30ff]"
  val hanClass: String = "[\u4e00-\u9fff]"
  val hangulClass: String = "[\uac00-\ud7a3]"
  /** U+0400\u201304FF, BOTH cases \u2014 script detection runs on raw text, not
    * the lowercased token stream. */
  val cyrillicClass: String = "[\u0400-\u04ff]"
  /** r19 lanes \u2014 the r18 verdict's remaining ungateable scripts. */
  val arabicClass: String = "[\u0600-\u06ff]"
  val devanagariClass: String = "[\u0900-\u097f]"
  val thaiClass: String = "[\u0e00-\u0e7f]"

  /** SCRIPT-AWARE language ID (r17; Hangul/Cyrillic r18): real non-Latin
    * text scores ZERO on every word profile and silently falls to the
    * argmax tiebreak (classified as the lexicographically largest latin
    * code) — the langid face of the `[a-z]+` trap the per-language LM
    * gate closed. Rules in [[langIdPred]]; SQL twin in
    * [[langIdExprSql]]. */
  def langIdMl(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langIdPred(col("text")).as("pred_lang"))

  /** The script-aware prediction as a bare Column over any text column —
    * for compositions that KEY on the prediction instead of joining a
    * per-doc table ([[Curation]]'s prediction-keyed release funnel,
    * r18). Rule order: each script test is DECISIVE for its language —
    * Kana → ja (unique to Japanese, decisive even in mixed Han/Kana
    * text, where Han alone is ambiguous between zh and ja), Hangul → ko,
    * Cyrillic → ru, Arabic → ar, Devanagari → hi, Thai → th (r19 — the
    * scripts are pairwise disjoint BMP blocks, so the order among them
    * is immaterial; each is decisive for its dominant language, the
    * same granularity the script rules already accept for zh/ru), then
    * Han → zh, else the word-profile argmax. One codegen'd projection,
    * no shuffle. */
  def langIdPred(text: Column): Column =
    when(size(regexp_extract_all(text, lit(kanaClass), lit(0))) > 0,
      lit("ja"))
      .when(size(regexp_extract_all(text, lit(hangulClass), lit(0))) > 0,
        lit("ko"))
      .when(size(regexp_extract_all(text, lit(cyrillicClass), lit(0))) > 0,
        lit("ru"))
      .when(size(regexp_extract_all(text, lit(arabicClass), lit(0))) > 0,
        lit("ar"))
      .when(size(regexp_extract_all(text, lit(devanagariClass), lit(0))) > 0,
        lit("hi"))
      .when(size(regexp_extract_all(text, lit(thaiClass), lit(0))) > 0,
        lit("th"))
      .when(size(regexp_extract_all(text, lit(hanClass), lit(0))) > 0,
        lit("zh"))
      .otherwise(profileArgmaxOf(text))

  /** DuckDB rendering of [[langIdPred]] over a text column: the same
    * script CASE, with the word-profile argmax unrolled largest-code-
    * first (`s_fr ≥ all the rest` → fr, else `s_es ≥ the rest` → es, …)
    * — exactly Spark's array_max over (score, code) structs, where ties
    * go to the lexicographically largest code. */
  def langIdExprSql(textCol: String = "text"): String = {
    def score(words: Seq[String]) =
      s"len(list_filter(string_split($textCol, ' '), t -> t IN (" +
        words.map(w => s"'$w'").mkString(",") + ")))"
    val byCodeDesc = langProfiles.sortBy(_._1).reverse
    val argmax = byCodeDesc.init.zipWithIndex.map { case ((code, words), i) =>
      val rest = byCodeDesc.drop(i + 1)
      val ge = rest.map { case (_, ws) => s"${score(words)} >= ${score(ws)}" }
        .mkString(" AND ")
      s"WHEN $ge THEN '$code'"
    }.mkString(" ") + s" ELSE '${byCodeDesc.last._1}' END"
    s"""CASE WHEN len(regexp_extract_all($textCol, '$kanaClass')) > 0 THEN 'ja'
       | WHEN len(regexp_extract_all($textCol, '$hangulClass')) > 0 THEN 'ko'
       | WHEN len(regexp_extract_all($textCol, '$cyrillicClass')) > 0 THEN 'ru'
       | WHEN len(regexp_extract_all($textCol, '$arabicClass')) > 0 THEN 'ar'
       | WHEN len(regexp_extract_all($textCol, '$devanagariClass')) > 0 THEN 'hi'
       | WHEN len(regexp_extract_all($textCol, '$thaiClass')) > 0 THEN 'th'
       | WHEN len(regexp_extract_all($textCol, '$hanClass')) > 0 THEN 'zh'
       | ELSE CASE $argmax END""".stripMargin
  }

  /** Quality metrics: char/token counts, mean token length, stopword and
    * non-alphanumeric ratios, plus a composite [0,1] score that rewards
    * mid-length documents with a healthy stopword rate. */
  def quality(docs: DataFrame): DataFrame = {
    val stop = Seq("the", "a", "and", "of", "to")
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin(stop.map(lit): _*)))
    val nChars = length(col("text"))
    val meanTokLen = (nChars - (nTok - 1)) / nTok // chars minus separators
    docs.select(
      col("doc_id"),
      nChars.as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      round(meanTokLen.cast("double"), 6).as("mean_tok_len"),
      round(nStop.cast("double") / nTok, 6).as("stopword_ratio"),
      round(
        least(nTok.cast("double") / 50.0, lit(1.0)) * 0.5
          + least(nStop.cast("double") / nTok * 10.0, lit(1.0)) * 0.5,
        6).as("quality_score"))
  }

  /** Model-based quality scoring: logistic regression over the declared
    * quality features with FIXED weights — the published curation pattern
    * (CCNet's fastText gate, FineWeb's edu classifier): the model trains
    * offline, and corpus-side inference is a pure per-row projection. The
    * heuristic [[quality]] score is a hand-tuned AND of gates; this is its
    * learned-model successor with a calibrated [0,1] output.
    *
    * `score = σ(w0 + w_mtl·mean_tok_len + w_stop·stopword_ratio
    *            + w_ltok·ln(1 + n_tokens))`, `pass = round(score,6) ≥ 0.5`.
    *
    * Determinism: features are the identical ratio expressions the
    * [[quality]] oracle replays; the single exp/ln pair stays ≤ ~e¹⁵ so
    * `round(…, 6)` absorbs JVM-vs-libm ULP gaps (tfidf precedent), and the
    * pass gate compares the ROUNDED score so both engines gate on the same
    * number. Per-row only — no shuffle, codegen end-to-end. */
  def lrQuality(docs: DataFrame,
      w0: Double = -3.0, wMeanTokLen: Double = 0.4,
      wStop: Double = 6.0, wLogTok: Double = 0.35): DataFrame =
    docs.select(
      col("doc_id"),
      lrScore(w0, wMeanTokLen, wStop, wLogTok).as("lr_score"))
      .withColumn("pass", (col("lr_score") >= 0.5).cast("int"))

  /** The rounded default-feature LR score as a bare Column (over a `text`
    * column in scope) — for compositions that fold the gate into an
    * existing projection instead of a join ([[Curation.release]]). */
  def lrScore(w0: Double = -3.0, wMeanTokLen: Double = 0.4,
      wStop: Double = 6.0, wLogTok: Double = 0.35): Column = {
    val z = lit(w0) + lit(wMeanTokLen) * featMtl + lit(wStop) * featSr +
      lit(wLogTok) * featLt
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** DuckDB expression for the rounded default-weight LR score of a text
    * column — the one formula composition oracles should inline
    * ([[graft.operators.Curation.releaseSql]]) instead of re-deriving the
    * weights; compare `>= 0.5` for the pass gate. */
  def lrScoreExprSql(textCol: String = "text"): String = {
    val n = s"len(string_split($textCol,' '))"
    val mtl = s"(length($textCol) - ($n - 1)) / $n"
    val sr = s"len(list_filter(string_split($textCol,' '), " +
      s"t -> t IN ('the','a','and','of','to'))) / $n"
    val lt = s"ln(1.0 + $n)"
    s"round(1.0 / (1.0 + exp(-(-3.0 + 0.4 * ($mtl) + 6.0 * ($sr) + 0.35 * ($lt)))), 6)"
  }

  /** The LR quality FEATURES, shared verbatim by scoring ([[lrQuality]])
    * and training ([[lrTrain]]) so a learned gate scores with exactly the
    * features it trained on: mean token length, stopword ratio,
    * ln(1 + tokens). Integer-derived ratios + one ln — bit-reproducible
    * in the oracle. */
  private def featMtl: Column = (length(col("text")) - (size(toks) - 1)) / size(toks)
  private def featSr: Column = {
    val stop = Seq("the", "a", "and", "of", "to")
    size(filter(toks, t => t.isin(stop.map(lit): _*))) / size(toks)
  }
  private def featLt: Column = log(lit(1.0) + size(toks))

  /** TRAIN the LR quality gate — fixed-iteration full-batch gradient
    * descent over the declared features, the `Bpe.learnMerges` proof
    * pattern applied to learning a MODEL: each iteration is ONE
    * map-side-combined gradient aggregate over the labeled docs
    * (corpus-scale, no shuffle beyond the aggregate); the weight update
    * is scalar driver arithmetic. Published-recipe shape (CCNet/FineWeb
    * train their quality classifiers offline on labeled docs; corpus
    * inference stays the pure projection [[lrQuality]] is).
    *
    * Determinism contract (what makes the DuckDB oracle replay the
    * arithmetic exactly): per-row sigmoids round to 6 decimals (the
    * engine-standard exp-ULP absorber), each row's per-feature gradient
    * contribution quantizes to an INTEGER (×10⁶, round-half-away) so the
    * gradient SUM is order-free exact integer arithmetic — never a
    * float sum whose accumulation order differs between engines — and
    * weights round to 9 decimals after each update. Zero init: the
    * first iteration's sigmoid is exactly 0.5 (exp(0) = 1), so training
    * trajectories are anchored by exact arithmetic before any
    * transcendental enters.
    *
    * Returns the weight trajectory: element i = (w0, wMtl, wStop,
    * wLogTok) AFTER iteration i+1 — feed the last through [[lrQuality]].
    * `label` must be a deterministic 0/1 row property. */
  def lrTrain(docs: DataFrame, label: Column, iters: Int = 5,
      step: Double = 0.5): Seq[Seq[Double]] = {
    require(iters > 0, s"iters must be positive, got $iters")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val feats = docs.select(label.cast("int").as("y"), featMtl.as("mtl"),
      featSr.as("sr"), featLt.as("lt")).persist(sl)
    try {
      val n = feats.count()
      require(n > 0, "lrTrain needs at least one labeled doc")
      // Spark's Round semantics (canonical-string BigDecimal, HALF_UP) —
      // the driver-side update must round exactly as the engine does.
      def round9(x: Double): Double =
        BigDecimal.decimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      var w = Vector(0.0, 0.0, 0.0, 0.0)
      val traj = Seq.newBuilder[Seq[Double]]
      for (_ <- 0 until iters) {
        val z = lit(w(0)) + lit(w(1)) * col("mtl") + lit(w(2)) * col("sr") +
          lit(w(3)) * col("lt")
        val d = round(lit(1.0) / (lit(1.0) + exp(-z)), 6) - col("y")
        val g = feats.agg(
          sum(round(d * 1000000).cast("long")).as("ga"),
          sum(round(d * col("mtl") * 1000000).cast("long")).as("gb"),
          sum(round(d * col("sr") * 1000000).cast("long")).as("gc"),
          sum(round(d * col("lt") * 1000000).cast("long")).as("gd"))
          .collect()(0)
        w = Vector.tabulate(4)(f =>
          round9(w(f) - step * ((g.getLong(f) / 1000000.0) / n)))
        traj += w
      }
      traj.result()
    } finally { feats.unpersist(false); () }
  }

  /** The DuckDB feature CTE `f(doc_id, y, mtl, sr, lt)` — the identical
    * expressions [[featMtl]]/[[featSr]]/[[featLt]] evaluate. */
  private def lrFeatSql(corpusSql: String, labelExpr: String,
      name: String = "f"): String =
    s"""$name AS (SELECT doc_id, $labelExpr AS y,
       |    (length(text) - (len(string_split(text,' ')) - 1)) / len(string_split(text,' ')) AS mtl,
       |    len(list_filter(string_split(text,' '), t -> t IN ('the','a','and','of','to'))) / len(string_split(text,' ')) AS sr,
       |    ln(1.0 + len(string_split(text,' '))) AS lt
       |  FROM $corpusSql)""".stripMargin

  /** The chained training CTEs `w0..w$iters` replaying [[lrTrain]] in
    * DuckDB — both sides generated from one contract (sigmoid→round6,
    * integer gradient quantization, round-9 weight update), so engine and
    * oracle cannot drift. Exposes `f`, `nn(n)` and `w$i(a, b, c, d)`. */
  private def lrTrainCtes(iters: Int, corpusSql: String,
      labelExpr: String, step: Double): String = {
    val sig = "round(1.0/(1.0+exp(-(a + b*mtl + c*sr + d*lt))),6)"
    val steps = (0 until iters).map { i =>
      s"""g$i AS (SELECT
         |    sum(CAST(round(($sig - y) * 1000000) AS BIGINT)) AS ga,
         |    sum(CAST(round(($sig - y) * mtl * 1000000) AS BIGINT)) AS gb,
         |    sum(CAST(round(($sig - y) * sr * 1000000) AS BIGINT)) AS gc,
         |    sum(CAST(round(($sig - y) * lt * 1000000) AS BIGINT)) AS gd
         |  FROM f CROSS JOIN w$i),
         | w${i + 1} AS (SELECT
         |    round(a - $step*((ga/1000000.0)/n), 9) AS a,
         |    round(b - $step*((gb/1000000.0)/n), 9) AS b,
         |    round(c - $step*((gc/1000000.0)/n), 9) AS c,
         |    round(d - $step*((gd/1000000.0)/n), 9) AS d
         |  FROM w$i CROSS JOIN g$i CROSS JOIN nn)""".stripMargin
    }
    (Seq(lrFeatSql(corpusSql, labelExpr),
      "nn AS (SELECT count(*) AS n FROM f)",
      """w0 AS (SELECT CAST(0.0 AS DOUBLE) AS a, CAST(0.0 AS DOUBLE) AS b,
        |  CAST(0.0 AS DOUBLE) AS c, CAST(0.0 AS DOUBLE) AS d)""".stripMargin)
      ++ steps).mkString(",\n ")
  }

  /** Oracle SQL: the weight TRAJECTORY as `(iter, w0, w_mtl, w_stop,
    * w_ltok)`, iter = 1..iters — the training run itself is
    * hash-checked, every gradient aggregate and rounding along the way. */
  def lrTrainSql(iters: Int, corpusSql: String = "documents",
      labelExpr: String = "CAST(lang = 'en' AS INT)",
      step: Double = 0.5): String = {
    val union = (1 to iters)
      .map(i => s"SELECT CAST($i AS BIGINT) AS iter, a AS w0, b AS w_mtl, c AS w_stop, d AS w_ltok FROM w$i")
      .mkString("\n   UNION ALL ")
    s"WITH ${lrTrainCtes(iters, corpusSql, labelExpr, step)}\n $union\n ORDER BY iter"
  }

  /** Oracle SQL: the corpus scored under the LEARNED weights — the
    * train → score chain end to end, matching [[lrQuality]] run on
    * [[lrTrain]]'s final weights. */
  def lrTrainedScoreSql(iters: Int, corpusSql: String = "documents",
      labelExpr: String = "CAST(lang = 'en' AS INT)",
      step: Double = 0.5): String =
    s"""WITH ${lrTrainCtes(iters, corpusSql, labelExpr, step)},
       | sc AS (SELECT doc_id,
       |    round(1.0/(1.0+exp(-(a + b*mtl + c*sr + d*lt))),6) AS lr_score
       |  FROM f CROSS JOIN w$iters)
       | SELECT doc_id, lr_score, CAST(lr_score >= 0.5 AS INT) AS pass
       | FROM sc ORDER BY doc_id""".stripMargin

  /** HELD-OUT evaluation of the trained LR gate — the missing rung between
    * training ([[lrTrain]]) and serving ([[lrQuality]]): split the labeled
    * corpus into train/test folds by the engine-standard md5 bucket
    * ([[Sampling.hashBucket]] — a pure row property, reproducible on any
    * engine), train on the standing fold, score the held-out fold with the
    * learned weights, and report threshold-free ranking quality (exact
    * Mann–Whitney AUC, ties by average rank) plus accuracy at the serving
    * threshold 0.5. One row: `(n_train, n_test, n_pos, auc, acc)`.
    *
    * Scale shape: the only corpus-scale stages are [[lrTrain]]'s gradient
    * aggregates and ONE `groupBy(score)` count over the scored test fold.
    * Scores round to 6 decimals, so the score-distinct table is bounded
    * (≤ ~2M rows) regardless of corpus size — the rank-cumulation window
    * runs over THAT bounded table, never a global sort of test rows (the
    * textbook `rank() OVER (ORDER BY score)` on raw rows is a
    * single-partition window at corpus scale; this is the aggregated,
    * metadata-scale form of the same arithmetic).
    *
    * Determinism: every rank-sum term is a count plus an exact half
    * (`below + (c+1)/2`), so the accumulation is exact in doubles up to
    * 2^52 test rows and order-free; the single float division per metric
    * rounds to 6 (engine-standard). A single-class test fold yields
    * `auc = NULL` (nullif denominator) on both engines rather than an
    * engine-specific divide-by-zero behavior. */
  def lrEval(docs: DataFrame, label: Column, iters: Int = 5,
      step: Double = 0.5, testPct: Int = 20, buckets: Int = 100): DataFrame = {
    require(testPct > 0 && testPct < buckets,
      s"testPct must be in (0, $buckets), got $testPct")
    val bucket = Sampling.hashBucket(col("doc_id"), buckets)
    val train = docs.where(bucket >= testPct)
    val test = docs.where(bucket < testPct)
    val w = lrTrain(train, label, iters, step).last
    val scored = lrQuality(test, w(0), w(1), w(2), w(3))
      .join(test.select(col("doc_id"), label.cast("int").as("y")), "doc_id")
    val byScore = scored.groupBy(col("lr_score"))
      .agg(count(lit(1)).as("c"), sum(col("y")).cast("long").as("p"),
        sum(((col("lr_score") >= 0.5).cast("int") === col("y"))
          .cast("long")).as("ok"))
    val asc = org.apache.spark.sql.expressions.Window.orderBy(col("lr_score"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = byScore.withColumn("below",
      coalesce(sum(col("c")).over(asc), lit(0L)))
    val trainN = train.agg(count(lit(1)).as("n_train"))
    val denom = col("pp") * (col("n_test") - col("pp"))
    cum.agg(
        sum(col("p") * (col("below") + (col("c") + lit(1)) / lit(2.0))).as("rs"),
        sum(col("p")).as("pp"), sum(col("c")).as("n_test"),
        sum(col("ok")).as("okc"))
      .crossJoin(broadcast(trainN))
      .select(col("n_train"), col("n_test"), col("pp").as("n_pos"),
        round((col("rs") - col("pp") * (col("pp") + lit(1)) / lit(2.0)) /
          when(denom === 0, lit(null)).otherwise(denom), 6).as("auc"),
        round(col("okc").cast("double") / col("n_test"), 6).as("acc"))
  }

  /** CALIBRATE the serving threshold on the held-out fold — the rung
    * after [[lrEval]]: instead of scoring at the default 0.5, pick the
    * LOWEST threshold whose held-out precision meets `targetPrecision`
    * (recall is monotone non-increasing in the threshold, so the lowest
    * qualifying threshold is the recall argmax subject to the precision
    * floor — the standard operating-point choice for a quality gate that
    * must not pass junk). One row: `(threshold, prec, rec, kept)`; EMPTY
    * when no threshold qualifies (the caller's signal to retrain, not a
    * silent fallback).
    *
    * Scale: identical to [[lrEval]] — training aggregates + one
    * groupBy(score) count; the cumulative TP/FP sweep runs over the
    * bounded score-distinct table (both single-partition windows are
    * metadata-scale by the same argument). Precision/recall round to 6
    * BEFORE the threshold filter so both engines pick from identical
    * values. */
  def lrCalibrate(docs: DataFrame, label: Column, targetPrecision: Double,
      iters: Int = 5, step: Double = 0.5, testPct: Int = 20,
      buckets: Int = 100): DataFrame = {
    require(targetPrecision > 0 && targetPrecision <= 1,
      s"targetPrecision must be in (0, 1], got $targetPrecision")
    require(testPct > 0 && testPct < buckets,
      s"testPct must be in (0, $buckets), got $testPct")
    val bucket = Sampling.hashBucket(col("doc_id"), buckets)
    val train = docs.where(bucket >= testPct)
    val test = docs.where(bucket < testPct)
    val w = lrTrain(train, label, iters, step).last
    val scored = lrQuality(test, w(0), w(1), w(2), w(3))
      .join(test.select(col("doc_id"), label.cast("int").as("y")), "doc_id")
    val byScore = scored.groupBy(col("lr_score"))
      .agg(count(lit(1)).as("c"), sum(col("y")).cast("long").as("p"))
    val W = org.apache.spark.sql.expressions.Window
    val desc = W.orderBy(col("lr_score").desc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val all = W.orderBy(col("lr_score"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    byScore.select(col("lr_score").as("threshold"),
        sum(col("p")).over(desc).as("tp"),
        sum(col("c") - col("p")).over(desc).as("fp"),
        sum(col("p")).over(all).as("pp"))
      .select(col("threshold"),
        round(col("tp") * lit(1.0) / (col("tp") + col("fp")), 6).as("prec"),
        round(col("tp") * lit(1.0) / col("pp"), 6).as("rec"),
        (col("tp") + col("fp")).as("kept"))
      .where(col("prec") >= targetPrecision)
      .orderBy(col("threshold"))
      .limit(1)
  }

  /** Oracle SQL replaying [[lrCalibrate]]: the lrEval CTE chain up to the
    * per-score counts, then the descending cumulative TP/FP sweep and the
    * lowest qualifying threshold. */
  def lrCalibrateSql(iters: Int, targetPrecision: Double,
      corpusSql: String = "documents",
      labelExpr: String = "CAST(lang = 'en' AS INT)",
      step: Double = 0.5, testPct: Int = 20, buckets: Int = 100): String = {
    val bkt =
      s"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % $buckets"
    s"""WITH tr AS (SELECT * FROM $corpusSql WHERE $bkt >= $testPct),
       | te AS (SELECT * FROM $corpusSql WHERE $bkt < $testPct),
       | ${lrTrainCtes(iters, "tr", labelExpr, step)},
       | ${lrFeatSql("te", labelExpr, "fe")},
       | sc AS (SELECT
       |    round(1.0/(1.0+exp(-(a + b*mtl + c*sr + d*lt))),6) AS lr_score, y
       |  FROM fe CROSS JOIN w$iters),
       | bys AS (SELECT lr_score, count(*) AS c,
       |    CAST(sum(y) AS BIGINT) AS p FROM sc GROUP BY lr_score),
       | cum AS (SELECT lr_score AS threshold,
       |    sum(p) OVER (ORDER BY lr_score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
       |    sum(c - p) OVER (ORDER BY lr_score DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
       |    sum(p) OVER () AS pp
       |  FROM bys)
       | SELECT threshold, round(tp*1.0/(tp+fp), 6) AS prec,
       |   round(tp*1.0/pp, 6) AS rec, CAST(tp + fp AS BIGINT) AS kept
       | FROM cum WHERE round(tp*1.0/(tp+fp), 6) >= $targetPrecision
       | ORDER BY threshold LIMIT 1""".stripMargin
  }

  /** Oracle SQL replaying [[lrEval]] end to end in DuckDB: fold split →
    * the chained training CTEs on the train fold → held-out scoring →
    * tie-aware rank-sum AUC + accuracy. The evaluation METRIC itself is
    * hash-checked, not just the scores feeding it. */
  def lrEvalSql(iters: Int, corpusSql: String = "documents",
      labelExpr: String = "CAST(lang = 'en' AS INT)",
      step: Double = 0.5, testPct: Int = 20, buckets: Int = 100): String = {
    val bkt =
      s"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % $buckets"
    s"""WITH tr AS (SELECT * FROM $corpusSql WHERE $bkt >= $testPct),
       | te AS (SELECT * FROM $corpusSql WHERE $bkt < $testPct),
       | ${lrTrainCtes(iters, "tr", labelExpr, step)},
       | ${lrFeatSql("te", labelExpr, "fe")},
       | sc AS (SELECT
       |    round(1.0/(1.0+exp(-(a + b*mtl + c*sr + d*lt))),6) AS lr_score, y
       |  FROM fe CROSS JOIN w$iters),
       | bys AS (SELECT lr_score, count(*) AS c,
       |    CAST(sum(y) AS BIGINT) AS p,
       |    CAST(sum(CAST(CAST(lr_score >= 0.5 AS INT) = y AS INT)) AS BIGINT) AS ok
       |  FROM sc GROUP BY lr_score),
       | cum AS (SELECT c, p, ok, coalesce(sum(c) OVER (ORDER BY lr_score
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
       |  FROM bys),
       | ag AS (SELECT sum(p * (below + (c + 1) / 2.0)) AS rs,
       |    CAST(sum(p) AS BIGINT) AS pp, CAST(sum(c) AS BIGINT) AS n_test,
       |    CAST(sum(ok) AS BIGINT) AS okc FROM cum),
       | tn AS (SELECT count(*) AS n_train FROM tr)
       | SELECT n_train, n_test, pp AS n_pos,
       |   round((rs - pp*(pp+1)/2.0) / nullif(pp*(n_test-pp), 0), 6) AS auc,
       |   round(okc * 1.0 / n_test, 6) AS acc
       | FROM ag CROSS JOIN tn ORDER BY n_test""".stripMargin
  }

  /** Token counting: whitespace tokens and a BPE-ish sub-token count
    * (alphanumeric runs + single non-alphanumeric, non-space marks). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("ws_tokens"),
      size(expr("regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]', 0)"))
        .cast("long").as("sub_tokens"))

  /** Intra-document repetition metrics — the standard training-corpus
    * quality signal for boilerplate/degenerate text (published corpus
    * filters gate on duplicate n-gram fractions): per doc, the total and
    * distinct word-n-gram counts, the duplicate fraction
    * `1 − distinct/total` (→ 1 for a doc that repeats one phrase), and the
    * hottest n-gram's occurrence count.
    *
    * Scale: one shingle explode → one (doc, shingle)-keyed count aggregate
    * (map-side combined) → one per-doc roll-up. Shuffle O(docs × distinct
    * shingles); a single corpus scan, nothing driver-side. */
  def repetition(docs: DataFrame, n: Int = 3): DataFrame =
    Dedup.shingles(docs, n, dedup = false)
      .groupBy(col("doc_id"), col("shingle"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_ngrams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_ngram_count"))
      .select(col("doc_id"), col("n_ngrams"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams"), 6)
          .as("dup_frac"),
        col("top_ngram_count"))

  /** Document fingerprint: lexicographic min of `md5(word 4-gram)` — a
    * winnowing-style content fingerprint, stable under both engines. Docs
    * shorter than 4 tokens hash their full text. */
  def fingerprint(docs: DataFrame): DataFrame =
    Dedup.shingles(docs, 4)
      .groupBy(col("doc_id"))
      .agg(min(md5(col("shingle"))).as("fingerprint"))

  /** TF-IDF term weights: `(tf / doc_len) * ln((N + 1) / (df + 1))` per
    * (doc, term) — the standard retrieval/curation weighting with add-one
    * smoothed idf (never divides by zero, never negative for df ≤ N).
    *
    * Plan shape for 100 TB: one token explode feeds BOTH the per-(doc,term)
    * tf count and (via per-doc-distinct re-aggregation) the df count; doc
    * lengths are a map-side-combined per-doc count. The (term → df) table
    * is VOCABULARY-sized — orders of magnitude under the corpus — so
    * Catalyst auto-broadcasts it onto the tf stream when it fits, else it's
    * a term-keyed shuffle join; the corpus-total N is a 1-row cross join
    * (broadcast). Nothing driver-side.
    *
    * Cross-engine float parity: tf/len and the idf log are both ≤ ~15 in
    * magnitude, so `round(..., 6)` absorbs any ULP gap between
    * `java.lang.Math.log` and libm `ln` (memory: round(x,6) is safe to
    * ~1e5).
    */
  def tfidf(docs: DataFrame): DataFrame = {
    val terms = docs.select(col("doc_id"), explode(toks).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docLen = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    tf
      .join(docLen, "doc_id")
      .join(df, "term")
      .crossJoin(total)
      .select(col("doc_id"), col("term"), col("tf"),
        round((col("tf").cast("double") / col("dl")) *
          log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6).as("tfidf"))
  }

  /** Line-level boilerplate removal (the CCNet-style cleanup): drop every
    * line whose normalized form (`lower(trim(line))`) appears in at least
    * `max(minDocs, maxDocFrac × corpus docs)` DISTINCT documents —
    * navigation chrome, license footers, cookie banners — and rebuild each
    * document from its surviving lines in original order. Blank lines are
    * never counted as boilerplate (and so never stripped); documents whose
    * EVERY line is boilerplate vanish from the output. This is the
    * upstream defense for the LSH saturation regime CapProbe measured:
    * corpus-wide boilerplate is cheapest to delete BEFORE it floods
    * fingerprint and band buckets (the caps bound that flood; this removes
    * it).
    *
    * Scale: one explode + one per-(line, doc) distinct + one count
    * aggregate, all map-side combinable. The boilerplate set is
    * `broadcast` by construction, not hope: a line must clear
    * `maxDocFrac × n_docs` docs to qualify, so there can be at most
    * `avg_lines_per_doc / maxDocFrac` distinct qualifying lines (e.g. 50
    * lines/doc at 5% ⇒ ≤ 1,000 entries) regardless of corpus size. The
    * rebuild groups by doc_id — the same shuffle key the explode left the
    * data on. */
  def stripBoilerplate(
      docs: DataFrame,
      maxDocFrac: Double = 0.05,
      minDocs: Int = 2,
      sep: String = "\n"): DataFrame = {
    require(maxDocFrac > 0.0 && maxDocFrac <= 1.0, s"maxDocFrac $maxDocFrac not in (0, 1]")
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), java.util.regex.Pattern.quote(sep))))
      .toDF("doc_id", "pos", "line")
    val norm = lower(trim(col("line")))
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val boiler = lines.where(length(norm) > 0)
      .select(col("doc_id"), norm.as("nl")).distinct()
      .groupBy(col("nl")).agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(nDocs)
      .where(col("df") >= greatest(lit(minDocs.toDouble), col("n_docs") * maxDocFrac))
      .select(col("nl"))
    lines.join(broadcast(boiler), norm === col("nl"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), sep).as("text"))
  }
}
