package graft

import graft.operators.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends TestBase {

  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("langId: argmax over keyword profiles, deterministic tie-break") {
    val d = docs(
      1L -> "the a fast table",          // en 3, de 1 → en
      2L -> "table join merge data row", // de 3, es 2 → de
      3L -> "zzz yyy xxx")               // all 0 → tie → largest code = fr
    val got = TextAnalysis.langId(d).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr"))
  }

  test("quality: exact metric arithmetic") {
    val d = docs(1L -> "the cat sat")
    val r = TextAnalysis.quality(d).collect()(0)
    assert(r.getAs[Int]("n_chars") == 11)
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Double]("mean_tok_len") == 3.0)   // (11 - 2) / 3
    assert(r.getAs[Double]("stopword_ratio") == 0.333333)
    // score = min(3/50,1)*0.5 + min(1/3*10,1)*0.5 = 0.03 + 0.5
    assert(r.getAs[Double]("quality_score") == 0.53)
  }

  test("tokenCounts: whitespace vs sub-token counts") {
    val d = docs(1L -> "ab-cd ef12 g,h")
    val r = TextAnalysis.tokenCounts(d).collect()(0)
    assert(r.getAs[Long]("ws_tokens") == 3L)
    // [ab][-][cd] [ef12] [g][,][h] → 7
    assert(r.getAs[Long]("sub_tokens") == 7L)
  }

  test("repetition: hand-computed duplicate-3-gram fraction") {
    // "a b c a b c a b c": 7 shingles — (a b c)×3, (b c a)×2, (c a b)×2
    // → n=7, distinct=3, dup_frac = 1 − 3/7, top = 3. A no-repeat doc
    // scores 0; a short doc falls back to its whole text (1 shingle).
    val d = docs(1L -> "a b c a b c a b c", 2L -> "p q r s", 3L -> "x y")
    val got = TextAnalysis.repetition(d)
      .as[(Long, Long, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 7L, 3L, 0.571429, 3L)))
    assert(got(2L) == ((2L, 2L, 2L, 0.0, 1L)))
    assert(got(3L) == ((3L, 1L, 1L, 0.0, 1L)))
  }

  test("fingerprint: identical docs share fingerprints, distinct docs differ") {
    val d = docs(1L -> "a b c d e", 2L -> "a b c d e", 3L -> "v w x y z")
    val fp = TextAnalysis.fingerprint(d).as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp.values.forall(_.length == 32))
  }

  test("multimodal: non-image payloads take the deterministic raw branch") {
    val media = Multimodal.mediaTable(
      Seq((1L, "hello world", "en", "srcA", 11L), (2L, "abc", "en", "srcB", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val feats = Multimodal.decode(media).collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).byte_len == 11L && feats(2L).byte_len == 3L)
    assert(feats(1L).mime == "application/x-fake-srcA")
    assert(feats(1L).digest ==
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9") // sha256("hello world")
    assert(feats(1L).format == "raw" && feats(1L).channels == 0 && feats(1L).px_sum == -1L)
    assert(feats(1L).width == 11 && feats(1L).n_frames == 12)
  }

  test("multimodal: frame sampling slices binary payloads on stride") {
    val media = Multimodal.mediaTable(
      Seq((1L, "x" * 100, "en", "s", 100L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
      .orderBy("frame_idx").collect()
    // 100 bytes → 4 frames (0..3), stride 2 keeps 0 and 2
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
    // empty payload → zero frames (not a spurious descending-sequence frame)
    val empty = Multimodal.sampleFrames(Multimodal.mediaTable(
      Seq((2L, "", "en", "s", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")))
    assert(empty.isEmpty)
  }

  test("lrQuality: hand-computed sigmoid; pass gates on the rounded score") {
    // "the cat sat of mats": 5 tokens, 19 chars, 2 stopwords (the, of).
    // mtl = (19-4)/5 = 3.0; sr = 0.4; lt = ln(6).
    // z = -3 + 0.4·3.0 + 6·0.4 + 0.35·ln(6) = 1.227137…; σ(z) = 0.773313
    val d = Seq((1L, "the cat sat of mats"), (2L, "zz")).toDF("doc_id", "text")
    val got = TextAnalysis.lrQuality(d)
      .as[(Long, Double, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val z = -3.0 + 0.4 * 3.0 + 6.0 * 0.4 + 0.35 * math.log(6.0)
    assert(got(1L)._1 == BigDecimal(1.0 / (1.0 + math.exp(-z)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(1L)._2 == 1)
    // "zz": 1 token, no stopwords: z = -3 + 0.4·2 + 0.35·ln(2) < 0 → fail
    assert(got(2L)._1 < 0.5 && got(2L)._2 == 0)
  }

  test("lrTrain: loss decreases monotonically; learned gate separates the fixture") {
    // separable by the stopword-ratio feature: label-1 docs are stopword-
    // dense, label-0 docs have none — the geometry lrTrain's features
    // were declared for.
    val d = ((0L until 30L).map(i => (i, s"the a of to and the a of to and w$i")) ++
        (100L until 130L).map(i => (i, s"xx yy zz qq rr ss tt uu vv w$i")))
      .toDF("doc_id", "text")
    val label = col("doc_id") < 50L
    val traj = TextAnalysis.lrTrain(d, label, iters = 8)
    assert(traj.length == 8)
    // mean logloss under each trajectory point, computed independently
    def loss(w: Seq[Double]): Double = {
      val rows = d.select(col("doc_id"),
          ((length(col("text")) - (size(split(col("text"), " ")) - 1)) /
            size(split(col("text"), " "))).as("mtl"),
          (size(filter(split(col("text"), " "),
            t => t.isin(Seq("the", "a", "and", "of", "to").map(lit): _*)))
            / size(split(col("text"), " "))).as("sr"),
          log(lit(1.0) + size(split(col("text"), " "))).as("lt"))
        .as[(Long, Double, Double, Double)].collect()
      rows.map { case (id, mtl, sr, lt) =>
        val y = if (id < 50L) 1.0 else 0.0
        val p = 1.0 / (1.0 + math.exp(-(w(0) + w(1) * mtl + w(2) * sr + w(3) * lt)))
        -(y * math.log(p) + (1 - y) * math.log(1 - p))
      }.sum / rows.length
    }
    val losses = loss(Seq(0.0, 0.0, 0.0, 0.0)) +: traj.map(loss)
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss must decrease monotonically: $losses")
    }
    // the learned gate separates the strata: stopword weight positive and
    // every label-1 doc outscores every label-0 doc
    val w = traj.last
    assert(w(2) > 0, s"stopword weight should be positive: $w")
    val scored = TextAnalysis.lrQuality(d, w(0), w(1), w(2), w(3))
      .as[(Long, Double, Int)].collect()
    val (pos, neg) = scored.partition(_._1 < 50L)
    assert(pos.map(_._2).min > neg.map(_._2).max,
      "learned scores must separate the labeled strata")
  }

  test("tfidf: hand-computed weights; corpus-wide terms get idf 0") {
    val d = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidf(d)
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // N=2; df(a)=2 → idf=ln(3/3)=0; df(b)=df(c)=1 → idf=ln(3/2)
    assert(got((1L, "a")) == ((2L, 0.0)))
    assert(got((2L, "a")) == ((1L, 0.0)))
    assert(got((1L, "b")) == ((1L, 0.135155))) // (1/3)·ln(1.5)
    assert(got((2L, "c")) == ((1L, 0.202733))) // (1/2)·ln(1.5)
  }

  test("stripBoilerplate: frequent lines drop, rare/blank/unique lines stay in order") {
    // 40 docs; threshold = max(minDocs=2, 40 × 0.1) = 4 distinct docs.
    //  - footer on every doc, case-varied → normalized df=40 → stripped
    //  - "rare shared line" on docs 0,1 → df=2 < 4 → kept
    //  - blank line in doc 0 → never counted, never stripped
    //  - doc 39 is ONLY the footer → zero surviving lines → dropped
    val rows = (0L until 39L).map { i =>
      val footer = if (i % 2 == 0) "THE COMMON FOOTER" else "the common footer"
      val rare = if (i < 2) "\nrare shared line" else ""
      val blank = if (i == 0) "\n" else ""
      i -> s"body of doc $i$blank$rare\n$footer"
    } :+ (39L -> "the common footer")
    val got = TextAnalysis.stripBoilerplate(rows.toDF("doc_id", "text"),
        maxDocFrac = 0.1).as[(Long, String)].collect().toMap
    assert(!got.contains(39L)) // fully-boilerplate doc vanishes
    assert(got(0L) == "body of doc 0\n\nrare shared line") // order + blank kept
    assert(got(1L) == "body of doc 1\nrare shared line")
    assert(got(5L) == "body of doc 5")
    assert(got.size == 39)
  }

  test("lrEval: separable fixture scores held-out AUC 1.0; all-tied scores score 0.5") {
    // the lrTrain fixture: label-1 docs stopword-dense, label-0 none —
    // the trained gate separates, so held-out ranking must be perfect
    val d = ((0L until 30L).map(i => (i, s"the a of to and the a of to and w$i")) ++
        (100L until 130L).map(i => (i, s"xx yy zz qq rr ss tt uu vv w$i")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.lrEval(d, col("doc_id") < 50L, iters = 8).collect()(0)
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == 60L)
    assert(r.getAs[Long]("n_test") > 0L && r.getAs[Long]("n_pos") > 0L)
    assert(r.getAs[Long]("n_pos") < r.getAs[Long]("n_test"),
      "fixture must put both classes in the held-out fold")
    assert(r.getAs[Double]("auc") == 1.0, s"separable fixture: $r")
    // identical texts → every score ties → average-rank AUC is exactly 0.5
    val tied = (0L until 40L).map(i => (i, "the the the")).toDF("doc_id", "text")
    val t = TextAnalysis.lrEval(tied, col("doc_id") % 2 === 0, iters = 3).collect()(0)
    assert(t.getAs[Long]("n_pos") > 0L &&
      t.getAs[Long]("n_pos") < t.getAs[Long]("n_test"),
      s"tie fixture needs both classes held out: $t")
    assert(t.getAs[Double]("auc") == 0.5, s"all-tied scores: $t")
  }
}
