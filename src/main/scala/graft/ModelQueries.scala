package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LangModel, Pii, Sampling}

/** Catalog rows for the round-16 model-based curation additions: the
  * Stupid-Backoff bigram LM quality family (CCNet-style perplexity
  * filtering with the engine's full persisted-model lifecycle) and the
  * typed PII detect/redact/stats family. Split from [[NorthStarQueries]]
  * purely to keep file sizes reviewable — same QueryDef contract.
  */
object ModelQueries {

  private val bktSql =
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"
  private def bkt = Sampling.hashBucket(col("doc_id"), 100)

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private def idText(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("text"))

  // The LM rows' corpus split: train on the md5-bucket >= 20 slice
  // (reference corpus), score the < 20 slice (arrivals) — the engine's
  // standard pure-row-property split, reproducible on any engine.
  private val lmTrainSql =
    s"(SELECT doc_id, text FROM documents WHERE $bktSql >= 20)"
  private val lmScoreSql =
    s"(SELECT doc_id, text FROM documents WHERE $bktSql < 20)"

  /** Quality-vs-junk planted corpus for the LM gate (the txt_lr_eval
    * fixture shape): original docs ∪ stopword-spam twins. The spam
    * prefix's "of"/"to"/"and" are OUTSIDE the synthetic vocabulary, so
    * twins score heavy OOV backoff — measured xent: originals
    * 1.42–1.58, twins 1.74–2.77 at sf0.01 → the 1.65 cut separates with
    * ≥ 0.07 margin on both sides (no score near the rounded boundary). */
  private val lmSpam = "the a of to and " * 3
  private val lmGateCut = 1.65
  private def lmJunkPlant(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"), col("lang"))
    d.unionAll(d.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(lit(lmSpam), col("text")).as("text"), col("lang")))
  }
  private val lmJunkPlantSql =
    s"""(SELECT doc_id, text, lang FROM documents
       | UNION ALL SELECT doc_id + 1000000, '$lmSpam' || text, lang
       | FROM documents)""".stripMargin

  // ---- PII planting ---------------------------------------------------
  // The synthetic corpus contains no digits or '@' (verified per
  // fixture), so every finding below is planted — counts are exact by
  // construction on both engines.
  private def piiText: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(
      col("text"),
      when(id % 5 === 0,
        concat(lit(" contact admin"), id.cast("string"),
          lit("@example.com now"))).otherwise(""),
      when(id % 10 === 0,
        concat(lit(" cc backup"), id.cast("string"), lit("@mail.org")))
        .otherwise(""),
      when(id % 7 === 0,
        concat(lit(" node 10."), (id % 256).cast("string"), lit(".0."),
          (id % 200).cast("string"), lit(" up"))).otherwise(""),
      when(id % 11 === 0,
        concat(lit(" call +1 555 "), (lit(100) + id % 900).cast("string"),
          lit(" 2345 today"))).otherwise(""))
  }
  private def piiPlant(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), piiText.as("text"), col("source"))
  private def piiPlantLang(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), piiText.as("text"), col("lang"))
  private val piiTextSql =
    """text ||
      |   CASE WHEN doc_id % 5 = 0
      |     THEN ' contact admin' || CAST(doc_id AS VARCHAR) || '@example.com now'
      |     ELSE '' END ||
      |   CASE WHEN doc_id % 10 = 0
      |     THEN ' cc backup' || CAST(doc_id AS VARCHAR) || '@mail.org'
      |     ELSE '' END ||
      |   CASE WHEN doc_id % 7 = 0
      |     THEN ' node 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
      |          CAST(doc_id % 200 AS VARCHAR) || ' up'
      |     ELSE '' END ||
      |   CASE WHEN doc_id % 11 = 0
      |     THEN ' call +1 555 ' || CAST(100 + doc_id % 900 AS VARCHAR) || ' 2345 today'
      |     ELSE '' END""".stripMargin
  private val piiPlantSql =
    s"""(SELECT doc_id, $piiTextSql AS text,
       |   source
       | FROM documents)""".stripMargin
  private val piiPlantLangSql =
    s"""(SELECT doc_id, $piiTextSql AS text,
       |   lang
       | FROM documents)""".stripMargin

  /** Stage `df` as ONE flat parquet file named `name` in `dir` — the
    * file-stream source lists files, not Spark output directories (the
    * NorthStarQueries pattern). */
  private def stageAsFile(df: DataFrame,
      dir: java.nio.file.Path, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stage")
    df.coalesce(1).write.parquet(tmp.resolve("d").toString)
    val ls = java.nio.file.Files.list(tmp.resolve("d"))
    val part =
      try ls.filter(p => p.toString.endsWith(".parquet")).findFirst.get
      finally ls.close()
    java.nio.file.Files.copy(part, dir.resolve(name))
    deleteRecursively(tmp)
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  val all: Seq[QueryDef] = Seq(

    // ---- n-gram LM quality (CCNet-style perplexity filtering) ---------

    // Per-document cross-entropy under a Stupid Backoff bigram LM trained
    // on the reference slice — train and score in one plan; the oracle
    // replays tokenization, both count tables, and the per-token backoff
    // CASE exactly.
    QueryDef("txt_lm_ppl")(
      s"""${LangModel.pplSql(lmTrainSql, lmScoreSql)}
         | ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = docs(s, dir)
      LangModel.ppl(idText(d.where(bkt >= 20)), idText(d.where(bkt < 20)))
        .orderBy("doc_id")
    },

    // The LM as a quality GATE on the planted quality-vs-junk corpus:
    // per-language funnel of documents whose xent under the clean
    // reference model clears the cut. The gate compares the ROUNDED
    // score (margin >= 0.07 on both sides of 1.65 — no boundary race).
    QueryDef("txt_lm_gate")(
      LangModel.gateSql(
        "(SELECT doc_id, text FROM documents)", lmJunkPlantSql, lmGateCut)
    ) { (s, dir) =>
      LangModel.gate(idText(docs(s, dir)), lmJunkPlant(s, dir), lmGateCut)
        .orderBy("lang")
    },

    // The LM's OPERATIONAL form: model trained once and PERSISTED
    // (vocabulary-scale count tables under a format-marked layout), then
    // arrivals score against the index — one batch scan + model-table
    // joins, the training corpus never rescanned. Oracle recomputes from
    // raw: hash equality proves persisted-probe == recompute.
    QueryDef("txt_lm_indexed")(
      s"""${LangModel.pplSql(lmTrainSql, lmScoreSql)}
         | ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = docs(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-lm-idx")
      LangModel.buildLmIndex(idText(d.where(bkt >= 20)), s"$tmp/model")
      val out = LangModel.scoreAgainstLmIndex(s"$tmp/model",
          idText(d.where(bkt < 20)))
        .orderBy("doc_id").localCheckpoint(true)
      deleteRecursively(tmp)
      out
    },

    // The model GROWN by an arriving batch — n-gram counts are additive,
    // so growth is one batch scan landing delta partitions (the standing
    // corpus is never rescanned, existing partitions never rewritten).
    // Oracle trains on the union raw: grown == recomputed.
    QueryDef("txt_lm_grown")({
      val grownTrain =
        s"(SELECT doc_id, text FROM documents WHERE $bktSql >= 20)"
      s"""${LangModel.pplSql(grownTrain, lmScoreSql)}
         | ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val d = docs(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-lm-grow")
      LangModel.buildLmIndex(idText(d.where(bkt >= 40)), s"$tmp/model")
      LangModel.appendToLmIndex(idText(d.where(bkt >= 20 && bkt < 40)),
        s"$tmp/model", ingestBatch = 0L)
      val out = LangModel.scoreAgainstLmIndex(s"$tmp/model",
          idText(d.where(bkt < 20)))
        .orderBy("doc_id").localCheckpoint(true)
      deleteRecursively(tmp)
      out
    },

    // Model TAKEDOWN: departing documents' counts leave as negated delta
    // partitions — one scan of the purged rows, standing partitions never
    // rewritten; n-grams whose total reaches zero read as never-seen.
    // Oracle trains on the survivors raw: subtracted == recounted-without.
    QueryDef("txt_lm_purge")({
      val keptTrain =
        s"(SELECT doc_id, text FROM documents WHERE $bktSql >= 20 AND $bktSql < 80)"
      s"""${LangModel.pplSql(keptTrain, lmScoreSql)}
         | ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val d = docs(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-lm-purge")
      LangModel.buildLmIndex(idText(d.where(bkt >= 20)), s"$tmp/model")
      LangModel.purgeFromLmIndex(idText(d.where(bkt >= 80)),
        s"$tmp/model", purgeId = 0L)
      val out = LangModel.scoreAgainstLmIndex(s"$tmp/model",
          idText(d.where(bkt < 20)))
        .orderBy("doc_id").localCheckpoint(true)
      deleteRecursively(tmp)
      out
    },

    // Append-side COMPACTION of the model: the grown+purged delta
    // partitions fold into re-summed seed partitions on the two-phase
    // commit machinery; zeroed n-grams drop. Same oracle as txt_lm_purge
    // — a hash match proves the fold preserved every surviving count.
    QueryDef("txt_lm_compacted")({
      val keptTrain =
        s"(SELECT doc_id, text FROM documents WHERE ($bktSql >= 40 AND $bktSql < 80) OR ($bktSql >= 20 AND $bktSql < 40))"
      s"""${LangModel.pplSql(keptTrain, lmScoreSql)}
         | ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val d = docs(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-lm-compact")
      LangModel.buildLmIndex(idText(d.where(bkt >= 40)), s"$tmp/model")
      LangModel.appendToLmIndex(idText(d.where(bkt >= 20 && bkt < 40)),
        s"$tmp/model", ingestBatch = 0L)
      LangModel.purgeFromLmIndex(idText(d.where(bkt >= 80)),
        s"$tmp/model", purgeId = 0L)
      LangModel.compactLmIndex(s, s"$tmp/model")
      val out = LangModel.scoreAgainstLmIndex(s"$tmp/model",
          idText(d.where(bkt < 20)))
        .orderBy("doc_id").localCheckpoint(true)
      deleteRecursively(tmp)
      out
    },

    // The model PRUNED for serving (KenLM-style min-count cut): fold,
    // then drop n-grams under the floor — pruned unigrams score as OOV,
    // pruned bigrams back off. The chain exercises prune-after-grow;
    // the oracle replays the cut (count floor + left-endpoint semi-join)
    // from raw. Bigrams commit before unigrams so a crash between the
    // folds can't break the conditional's denominator invariant.
    QueryDef("txt_lm_pruned")(
      s"""${LangModel.pplSql(lmTrainSql, lmScoreSql, minCount = 30L)}
         | ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = docs(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-lm-prune")
      LangModel.buildLmIndex(idText(d.where(bkt >= 40)), s"$tmp/model")
      LangModel.appendToLmIndex(idText(d.where(bkt >= 20 && bkt < 40)),
        s"$tmp/model", ingestBatch = 0L)
      LangModel.pruneLmIndex(s, s"$tmp/model", minCount = 30L)
      val out = LangModel.scoreAgainstLmIndex(s"$tmp/model",
          idText(d.where(bkt < 20)))
        .orderBy("doc_id").localCheckpoint(true)
      deleteRecursively(tmp)
      out
    },

    // Moore–Lewis cross-entropy-difference selection (ACL 2010): every
    // candidate scored under the IN-domain model (clean originals) and
    // the OUT-domain model (the spam-prefixed twins' corpus); keep
    // delta = xent_in − xent_out ≤ 0.2. Measured: originals delta
    // −0.103..0.022, twins 0.410..2.046 at sf0.01 — the cut separates
    // with ≥ 0.18 margin on both sides. The full per-doc score table is
    // hash-checked, not just the funnel.
    QueryDef("txt_lm_select")({
      val inT = "(SELECT doc_id, text FROM documents)"
      val outT =
        s"(SELECT doc_id + 1000000 AS doc_id, '$lmSpam' || text AS text FROM documents)"
      val batch =
        s"(SELECT doc_id, text FROM $lmJunkPlantSql b)"
      s"""SELECT * FROM (
         |  ${LangModel.mooreLewisSql(inT, outT, batch, 0.2)}
         | ) ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val d = docs(s, dir)
      val outTrain = idText(d).select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit(lmSpam), col("text")).as("text"))
      LangModel.mooreLewis(idText(d), outTrain,
          lmJunkPlant(s, dir).select(col("doc_id"), col("text")), cut = 0.2)
        .orderBy("doc_id")
    },

    // The LM loop's STREAMING twin: per micro-batch, arrivals score
    // against the persisted model, then their counts fold in — batch k
    // scores against seed ∪ batches 0..k−1 (the noveltyIngest
    // discipline; the probe excludes the batch's own partition, so a
    // crash replay scores identically). The oracle replays each batch's
    // scoring from the raw slices — hash equality proves index-probed ==
    // sequentially-recomputed per batch.
    QueryDef("txt_lm_stream")({
      val b0 = s"(SELECT doc_id, text FROM documents WHERE $bktSql < 10)"
      val grown =
        s"(SELECT doc_id, text FROM documents WHERE $bktSql >= 20 OR $bktSql < 10)"
      val b1 =
        s"(SELECT doc_id, text FROM documents WHERE $bktSql >= 10 AND $bktSql < 20)"
      s"""SELECT CAST(0 AS BIGINT) AS micro_batch, *
         |   FROM (${LangModel.pplSql(lmTrainSql, b0)})
         | UNION ALL SELECT CAST(1 AS BIGINT), *
         |   FROM (${LangModel.pplSql(grown, b1)})
         | ORDER BY micro_batch, doc_id""".stripMargin
    }) { (s, dir) =>
      val d = docs(s, dir)
      val stDir = java.nio.file.Files.createTempDirectory("graft-lm-stream-q")
      val inDir = java.nio.file.Files.createTempDirectory("graft-lm-stream-in")
      val t0 = System.nanoTime()
      LangModel.buildLmIndex(idText(d.where(bkt >= 20)), s"$stDir/model")
      stageAsFile(d.where(bkt < 10), inDir, "b0.parquet")
      stageAsFile(d.where(bkt >= 10 && bkt < 20), inDir, "b1.parquet")
      NorthStarQueries.fixtureSecs.put("lm-stream-fixture",
        (System.nanoTime() - t0) / 1e9)
      val q = graft.streaming.Streams.lmIngest(
        graft.streaming.Streams.documentsStream(s, inDir.toString,
          maxFilesPerTrigger = 1),
        s"$stDir/model", s"$stDir/scores", s"$stDir/ckpt")
      q.awaitTermination()
      val out = s.read.parquet(s"$stDir/scores")
        .select(col("micro_batch").cast("long").as("micro_batch"),
          col("doc_id"), col("n_tokens"), col("n_oov"), col("n_backoff"),
          col("xent"))
        .orderBy(col("micro_batch"), col("doc_id")).localCheckpoint(true)
      deleteRecursively(stDir)
      deleteRecursively(inDir)
      out
    },

    // END-TO-END release funnel: LR quality gate → LM gate → typed PII
    // redaction → exact dedup over the REDACTED text, per-lang funnel.
    // Corpus plants work for every stage: PII appendages (redaction +
    // finding density), spam twins (die at the LM gate — measured xent
    // ≥ 1.627 vs originals ≤ 1.584 under the planted-trained model, so
    // the 1.6 cut separates), and exact copies of the first 20 docs
    // (collapse at dedup). The LM trains on the PLANTED originals so
    // planted PII tokens are in-vocabulary and originals stay below cut.
    QueryDef("cur_release")(
      graft.operators.Curation.releaseSql(
        s"""(SELECT doc_id, text, lang FROM $piiPlantLangSql p
           | UNION ALL SELECT doc_id + 1000000, '$lmSpam' || text, lang
           |   FROM $piiPlantLangSql p
           | UNION ALL SELECT doc_id + 2000000, text, lang
           |   FROM $piiPlantLangSql p WHERE doc_id < 20)""".stripMargin,
        s"(SELECT doc_id, text FROM $piiPlantLangSql p)", maxXent = 1.6)
    ) { (s, dir) =>
      val planted = piiPlantLang(s, dir)
      val corpus = planted
        .unionAll(planted.select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit(lmSpam), col("text")).as("text"), col("lang")))
        .unionAll(planted.where(col("doc_id") < 20)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text"),
            col("lang")))
      graft.operators.Curation.release(corpus,
          idText(planted), maxXent = 1.6)
        .orderBy("lang")
    },

    // ---- typed PII detection / redaction -------------------------------

    // Per-document typed finding counts over the planted corpus.
    QueryDef("txt_pii")(
      s"""${Pii.detectSql(s"(SELECT doc_id, text FROM $piiPlantSql p)")}
         | ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Pii.detect(piiPlant(s, dir)).orderBy("doc_id")
    },

    // Typed redaction: every planted span replaced by its category token
    // — the full redacted text is hash-compared, so a half-eaten span or
    // an engine disagreeing on match extents fails the row.
    QueryDef("txt_pii_redact")(
      s"""${Pii.redactSql(s"(SELECT doc_id, text FROM $piiPlantSql p)")}
         | ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Pii.redact(piiPlant(s, dir)).orderBy("doc_id")
    },

    // Corpus-level PII prevalence by source — the release-gate report.
    QueryDef("txt_pii_stats")(
      s"""${Pii.statsSql(piiPlantSql, "source")}
         | ORDER BY source""".stripMargin
    ) { (s, dir) =>
      Pii.stats(piiPlant(s, dir), "source").orderBy("source")
    },

    // The PII report's STREAMING twin (Streams.piiMonitor): per
    // micro-batch prevalence, batchId-keyed overwrite — a pure observer
    // beside the drift monitor, so replay exactness is the keyed write
    // alone. The oracle replays each batch's report from its raw slice.
    QueryDef("txt_pii_stream")({
      def slice(lo: Int, hi: Int) =
        s"(SELECT doc_id, text, source FROM $piiPlantSql p WHERE $bktSql >= $lo AND $bktSql < $hi)"
      s"""SELECT CAST(0 AS BIGINT) AS micro_batch, *
         |   FROM (${Pii.statsSql(slice(0, 50), "source")})
         | UNION ALL SELECT CAST(1 AS BIGINT), *
         |   FROM (${Pii.statsSql(slice(50, 100), "source")})
         | ORDER BY micro_batch, source""".stripMargin
    }) { (s, dir) =>
      val planted = piiPlant(s, dir)
        .join(docs(s, dir).select(col("doc_id"), col("lang"),
          col("n_chars")), Seq("doc_id"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      val stDir = java.nio.file.Files.createTempDirectory("graft-pii-stream-q")
      val inDir = java.nio.file.Files.createTempDirectory("graft-pii-stream-in")
      stageAsFile(planted.where(bkt >= 0 && bkt < 50), inDir, "b0.parquet")
      stageAsFile(planted.where(bkt >= 50 && bkt < 100), inDir, "b1.parquet")
      val q = graft.streaming.Streams.piiMonitor(
        graft.streaming.Streams.documentsStream(s, inDir.toString,
          maxFilesPerTrigger = 1),
        s"$stDir/stats", s"$stDir/ckpt")
      q.awaitTermination()
      val out = s.read.parquet(s"$stDir/stats")
        .select(col("micro_batch").cast("long").as("micro_batch"),
          col("source"), col("n_docs"), col("n_docs_pii"), col("n_email"),
          col("n_phone"), col("n_ip"), col("pii_rate"))
        .orderBy(col("micro_batch"), col("source")).localCheckpoint(true)
      deleteRecursively(stDir)
      deleteRecursively(inDir)
      out
    })
}
