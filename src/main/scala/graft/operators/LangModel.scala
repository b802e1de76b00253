package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-based bigram language model with Stupid Backoff smoothing (Brants
  * et al., "Large Language Models in Machine Translation", EMNLP 2007) —
  * the CCNet/FineWeb quality rung the LR gate ([[TextAnalysis.lrQuality]])
  * doesn't cover: score every document by its cross-entropy under a
  * reference-corpus n-gram LM and gate on the score. CCNet filters by
  * KenLM perplexity; this is the same operation with the model itself
  * trained, persisted, grown, purged and compacted inside the engine.
  *
  * Everything is integer-count arithmetic until the final per-token
  * `log10`, so the DuckDB oracle replays training AND scoring exactly
  * (per-doc sums of ~100 doubles differ across engines only in the last
  * ulps — far below the contract's `round(x, 6)`).
  *
  * Scale posture (100 TB): the model is VOCABULARY-scale, not
  * corpus-scale — training is one map-side-combined count aggregate per
  * n-gram order; scoring joins the document token stream against the
  * model tables on word keys (AQE broadcasts them when they fit, shuffles
  * otherwise — never a driver collect). Counts are additive, so the
  * persisted model gets the engine's standard index lifecycle for free:
  * grow = per-batch delta partitions, purge = negated deltas, compact =
  * one fold — the [[Curation]] drift-histogram discipline applied to an
  * n-gram table.
  */
object LangModel {

  /** Stupid Backoff discount (the published constant). */
  val alpha: Double = 0.4

  /** Tokenization shared by train and score: lowercase alpha runs. One
    * regex both engines parse identically (Java util.regex and RE2 agree
    * on `[a-z]+`). */
  private def toks(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** (doc_id, pos, w, w1) token stream: 1-based position, `w1` = previous
    * token (null at pos 1). Built by zipping the token array against its
    * own shift — one projection, no self-join, no window shuffle. */
  private def tokenStream(docs: DataFrame): DataFrame = {
    val ts = toks(col("text"))
    docs
      .select(col("doc_id"), ts.as("ts"))
      .where(size(col("ts")) > 0)
      .select(col("doc_id"), posexplode(
        zip_with(
          col("ts"),
          concat(array(lit(null).cast("string")),
            slice(col("ts"), lit(1), greatest(size(col("ts")) - 1, lit(0)))),
          (w, p) => struct(w.as("w"), p.as("w1")))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        col("col.w").as("w"), col("col.w1").as("w1"))
  }

  /** Unigram counts of a corpus: (w, c). Map-side combined. */
  def unigramCounts(docs: DataFrame): DataFrame =
    docs.select(explode(toks(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))

  /** Bigram counts of a corpus: (w1, w2, c). Derived from the per-doc
    * token array (adjacent pairs), never a token-table self-join. */
  def bigramCounts(docs: DataFrame): DataFrame =
    tokenStream(docs).where(col("w1").isNotNull)
      .select(col("w1"), col("w").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))

  /** Per-document cross-entropy under the Stupid Backoff bigram model
    * given explicitly as count tables — the pure scoring kernel shared by
    * the in-memory and persisted-index forms.
    *
    * Per token t_i: the first token and any token whose preceding bigram
    * is unseen score the add-one unigram `(c(t_i)+1)/(N+V)` (times
    * [[alpha]] in the backoff case); a seen bigram scores the conditional
    * `c(t_{i-1} t_i)/c(t_{i-1})`. Output per doc: token count, OOV count,
    * backoff count, `xent = round(-avg log10 p, 6)` (lower = more like
    * the reference corpus). */
  def scoreWith(batch: DataFrame, uni: DataFrame, bi: DataFrame): DataFrame = {
    // 1-row totals ride a broadcast cross join (scalar metadata, the
    // engine's standard pattern for corpus-level constants).
    val tot = uni.agg(sum(col("c")).cast("double").as("n"),
      count(lit(1)).cast("double").as("v"))
    val st = tokenStream(batch)
      .join(bi.select(col("w1"), col("w2").as("w"), col("c").as("c_bi")),
        Seq("w1", "w"), "left")
      .join(uni.select(col("w").as("w1"), col("c").as("c_w1")), Seq("w1"), "left")
      .join(uni.select(col("w"), col("c").as("c_w")), Seq("w"), "left")
      .crossJoin(broadcast(tot))
    val uniP = (coalesce(col("c_w"), lit(0L)).cast("double") + 1.0) /
      (col("n") + col("v"))
    val lp = when(col("w1").isNull, log10(uniP))
      .when(col("c_bi").isNotNull,
        log10(col("c_bi").cast("double") / col("c_w1").cast("double")))
      .otherwise(log10(lit(alpha) * uniP))
    st.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("c_w").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(when(col("w1").isNotNull && col("c_bi").isNull, 1L).otherwise(0L))
          .as("n_backoff"),
        round(-sum(lp) / count(lit(1)), 6).as("xent"))
  }

  /** In-memory form: train on `train`, score `batch` — two aggregates and
    * the scoring join chain in one plan. */
  def ppl(train: DataFrame, batch: DataFrame): DataFrame =
    scoreWith(batch, unigramCounts(train), bigramCounts(train))

  /** Gate form: keep documents whose cross-entropy under the reference
    * model is at most `maxXent`, reporting the per-language funnel
    * (n_in → n_kept) — the CCNet head/middle/tail-style cut as one
    * composable verb. The gate compares the ROUNDED score so both
    * engines cut on the same number. */
  def gate(train: DataFrame, batch: DataFrame, maxXent: Double): DataFrame = {
    val scored = ppl(train, batch.select(col("doc_id"), col("text")))
    batch.join(scored.select(col("doc_id"), col("xent")), Seq("doc_id"), "left")
      .groupBy(col("lang")).agg(
        count(lit(1)).as("n_in"),
        sum(when(col("xent").isNotNull && col("xent") <= maxXent, 1L)
          .otherwise(0L)).as("n_kept"))
  }

  /** Moore–Lewis cross-entropy-difference data selection (Moore & Lewis,
    * "Intelligent Selection of Language Model Training Data", ACL 2010):
    * score every candidate under an IN-domain model and an OUT-domain
    * model, keep documents whose difference `xent_in − xent_out` clears
    * the cut — the standard trick for mining a huge general corpus for
    * in-domain-like training data. Both scores come from [[scoreWith]],
    * so the whole thing is two vocabulary-scale model joins over one
    * batch scan; the difference is computed from the ROUNDED per-model
    * scores, so both engines select on identical numbers. */
  def mooreLewis(inTrain: DataFrame, outTrain: DataFrame, batch: DataFrame,
      cut: Double): DataFrame = {
    val inScore = ppl(inTrain, batch)
      .select(col("doc_id"), col("xent").as("xent_in"))
    val outScore = ppl(outTrain, batch)
      .select(col("doc_id"), col("xent").as("xent_out"))
    inScore.join(outScore, Seq("doc_id"))
      .select(col("doc_id"), col("xent_in"), col("xent_out"),
        round(col("xent_in") - col("xent_out"), 6).as("delta"))
      .withColumn("selected",
        (col("delta") <= cut).cast("int"))
  }

  /** Oracle for [[mooreLewis]]: two ppl chains joined on doc_id.
    * `inTrainSql` / `outTrainSql` / `batchSql` are parenthesized
    * (doc_id, text) SELECTs. Callers append ORDER BY. */
  def mooreLewisSql(inTrainSql: String, outTrainSql: String,
      batchSql: String, cut: Double): String =
    s"""WITH insc AS (
       |  ${pplSql(inTrainSql, batchSql)}
       | ),
       | outsc AS (
       |  ${pplSql(outTrainSql, batchSql)}
       | )
       | SELECT i.doc_id, i.xent AS xent_in, o.xent AS xent_out,
       |        round(i.xent - o.xent, 6) AS delta,
       |        CAST(round(i.xent - o.xent, 6) <= $cut AS INT) AS selected
       | FROM insc i JOIN outsc o ON i.doc_id = o.doc_id""".stripMargin

  // ---- persisted model lifecycle (the drift-index discipline) ------------

  /** Persisted layout version. 1 = alpha-run tokens, (w,c)/(w1,w2,c)
    * count tables under `unigrams/ingest=<id>` + `bigrams/ingest=<id>`. */
  private val lmFormatVersion = 1
  private val formatMarkerName = "_GRAFT_LM_FORMAT"

  private def writeFormatMarker(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, formatMarkerName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$lmFormatVersion\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** Fail-loud layout gate on every read path — a model written under a
    * different tokenizer or table scheme must error, not silently score
    * everything as OOV (the failure mode that looks like drift in the
    * xent distribution instead of looking like a bug). */
  private def requireFormat(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, formatMarkerName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"LM model at $dir has no $formatMarkerName marker — not an engine " +
        "LM layout (or its build never completed); rebuild with buildLmIndex")
    val in = fs.open(p)
    val stored =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    require(stored == lmFormatVersion.toString,
      s"LM model at $dir is layout v$stored; this engine reads " +
        s"v$lmFormatVersion — rebuild it with buildLmIndex")
  }

  // ---- two-phase delta commit --------------------------------------------
  // A model mutation writes TWO tables (unigram + bigram deltas); a crash
  // between two bare writes would leave them inconsistent — c(w1) reduced
  // while c(w1,w2) isn't, so a seen-bigram conditional can exceed 1 and
  // xent silently skews (the "looks like drift instead of a bug" failure
  // the format marker exists to prevent). So every grow/purge stages both
  // deltas, commits via an atomic marker, and rolls forward; every read
  // path repairs first (the Purge.rewritePartitions discipline, local to
  // this layout because its partitions span two subdirectories).

  private val deltaMarkerName = "_GRAFT_LM_DELTA"
  private val deltaStageName = "_graft_lm_delta_stage"

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def rollForwardDelta(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, rels: Seq[String]): Unit = {
    rels.foreach { rel =>
      val staged = new org.apache.hadoop.fs.Path(s"$dir/$deltaStageName/$rel")
      val live = new org.apache.hadoop.fs.Path(s"$dir/$rel")
      // idempotent: staged absent ⇒ this table already swapped in
      if (fs.exists(staged)) {
        fs.delete(live, true)
        require(fs.rename(staged, live),
          s"LM delta roll-forward: rename $staged -> $live failed")
      }
    }
    fs.delete(new org.apache.hadoop.fs.Path(dir, deltaMarkerName), false)
    fs.delete(new org.apache.hadoop.fs.Path(dir, deltaStageName), true)
    ()
  }

  /** Every-read-path repair: the delta commit's own marker PLUS any
    * crashed [[Purge.rewritePartitions]] fold on either table root
    * ([[compactLmIndex]]/[[pruneLmIndex]] commit through it — a compact
    * interrupted after its seed SWAP but before its delta DROPs would
    * otherwise double-count the un-dropped deltas on every score until
    * the next owner op). All metadata-scale (fs stats). */
  private def repairAll(spark: SparkSession, dir: String): Unit = {
    repairDelta(spark, dir)
    Purge.repairPartitionRewrite(spark, s"$dir/unigrams")
    Purge.repairPartitionRewrite(spark, s"$dir/bigrams")
  }

  /** Finish (marker present) or discard (marker absent) an interrupted
    * delta commit. Idempotent; a no-op on a healthy layout; runs at the
    * head of every read/mutate path. */
  private def repairDelta(spark: SparkSession, dir: String): Unit = {
    val (fs, root) = fsOf(spark, dir)
    if (!fs.exists(root)) return
    val marker = new org.apache.hadoop.fs.Path(dir, deltaMarkerName)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val rels =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
          .filter(_.nonEmpty)
        finally in.close()
      rollForwardDelta(fs, dir, rels)
    } else {
      fs.delete(new org.apache.hadoop.fs.Path(dir, deltaMarkerName + ".tmp"), false)
      fs.delete(new org.apache.hadoop.fs.Path(dir, deltaStageName), true)
      ()
    }
  }

  /** Stage both delta tables, commit atomically, roll forward. BatchId-
    * keyed rels make replays converge (delete-live-then-rename rewrites
    * identical bytes). */
  private def writeDeltas(uniDelta: DataFrame, biDelta: DataFrame,
      dir: String, ingestId: Long): Unit = {
    val spark = uniDelta.sparkSession
    val (fs, _) = fsOf(spark, dir)
    repairDelta(spark, dir)
    val rels = Seq(s"unigrams/ingest=$ingestId", s"bigrams/ingest=$ingestId")
    uniDelta.repartition(1).write.mode("overwrite")
      .parquet(s"$dir/$deltaStageName/${rels(0)}")
    biDelta.repartition(1).write.mode("overwrite")
      .parquet(s"$dir/$deltaStageName/${rels(1)}")
    // atomic marker = THE commit point (tmp + rename)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/$deltaMarkerName.tmp")
    val out = fs.create(tmp, true)
    try out.write((rels.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, new org.apache.hadoop.fs.Path(dir, deltaMarkerName)),
      s"LM delta commit-marker rename failed at $dir")
    rollForwardDelta(fs, dir, rels)
  }

  /** Train and persist the model: count tables land under seed partitions
    * (`ingest=-1`), marker written LAST so a crashed build is refused by
    * every probe rather than scoring against half a vocabulary. */
  def buildLmIndex(standing: DataFrame, dir: String): Unit = {
    val spark = standing.sparkSession
    unigramCounts(standing).repartition(1)
      .write.mode("overwrite").parquet(s"$dir/unigrams/ingest=-1")
    bigramCounts(standing).repartition(1)
      .write.mode("overwrite").parquet(s"$dir/bigrams/ingest=-1")
    writeFormatMarker(spark, dir)
  }

  /** GROW the model by an arriving batch — counts are additive, so growth
    * is one batch scan landing vocabulary-scale delta partitions; the
    * standing corpus is never rescanned, existing partitions never
    * rewritten. BatchId-keyed overwrite → a crash-replayed micro-batch
    * rewrites its own partition with identical data. */
  def appendToLmIndex(batch: DataFrame, dir: String, ingestBatch: Long): Unit = {
    require(ingestBatch >= 0,
      s"ingest batch id $ingestBatch is negative — -1 is the seed partition")
    requireFormat(batch.sparkSession, dir)
    writeDeltas(unigramCounts(batch), bigramCounts(batch), dir, ingestBatch)
  }

  /** TAKEDOWN: remove departing documents' contribution — one scan of the
    * purged rows, negated delta partitions (`ingest=-(2+purgeId)`,
    * the [[Curation.purgeFromDriftIndex]] id scheme). Validates BEFORE
    * committing that the subtraction can't drive any unigram OR bigram
    * count negative (the claimed rows were never counted in) — a failed
    * purge leaves the live layout byte-untouched; a passing one commits
    * both delta tables under the two-phase marker. */
  def purgeFromLmIndex(purgedRows: DataFrame, dir: String, purgeId: Long): Unit = {
    require(purgeId >= 0, s"purge id $purgeId is negative")
    val spark = purgedRows.sparkSession
    requireFormat(spark, dir)
    repairAll(spark, dir)
    // candidate deltas, eagerly pinned: the validation reads them and the
    // commit writes them — one computation for both
    val uniDelta = unigramCounts(purgedRows)
      .select(col("w"), (-col("c")).as("c")).localCheckpoint(true)
    val biDelta = bigramCounts(purgedRows)
      .select(col("w1"), col("w2"), (-col("c")).as("c")).localCheckpoint(true)
    // Validate BEFORE committing anything (live ∪ candidate must stay
    // non-negative in BOTH tables): unigram totals can balance while a
    // bigram goes negative (train "a b", purge "b a" — same unigram bag,
    // opposite orientation), and a silently-negative bigram would be
    // dropped by readModel's c>0 filter while the never-purged (a,b)
    // survives — an inconsistent model instead of a loud error.
    // Failure leaves the live layout byte-untouched (no rollback window).
    // The live read EXCLUDES this purge id's own partition so a RETRIED
    // purge (an orchestration crashed after this family committed, then
    // re-ran end to end — Takedown's documented recovery) validates
    // against exactly the state its first attempt saw instead of
    // double-counting its own committed delta and throwing spuriously;
    // the keyed overwrite then rewrites identical bytes.
    val own = -(2 + purgeId)
    val negUni = spark.read.parquet(s"$dir/unigrams")
      .where(col("ingest") =!= own).select(col("w"), col("c"))
      .unionAll(uniDelta)
      .groupBy(col("w")).agg(sum(col("c")).as("c"))
      .where(col("c") < 0).limit(1).collect()
    val negBi =
      if (negUni.nonEmpty) negUni
      else spark.read.parquet(s"$dir/bigrams")
        .where(col("ingest") =!= own)
        .select(col("w1"), col("w2"), col("c"))
        .unionAll(biDelta)
        .groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("c"))
        .where(col("c") < 0).limit(1).collect()
    if (negUni.nonEmpty || negBi.nonEmpty) {
      val what = if (negUni.nonEmpty) s"unigram ${negUni.head}"
        else s"bigram ${negBi.head}"
      throw new IllegalArgumentException(
        s"purgeFromLmIndex: purging would drive $what negative — the " +
          s"claimed rows were never (all) counted into $dir; model " +
          "unchanged")
    }
    writeDeltas(uniDelta, biDelta, dir, -(2 + purgeId))
  }

  /** Fold accumulated ingest/purge delta partitions into re-summed seed
    * partitions — the append-side compaction verb. N-grams whose total
    * reached zero (fully departed) drop, matching [[readModel]]'s
    * read-time discipline, so probe results are identical before and
    * after. Two-phase commit per table via [[Purge.rewritePartitions]];
    * the format marker is untouched. */
  def compactLmIndex(spark: SparkSession, dir: String): Unit = {
    requireFormat(spark, dir)
    repairDelta(spark, dir)
    // The two per-table folds commit independently (each is two-phase via
    // rewritePartitions): a crash between them leaves one table folded and
    // the other not — CONSISTENT, because folding preserves every n-gram's
    // total; the next compact simply finishes the other table.
    def fold(sub: String, keys: Seq[String]): Unit = {
      val root = s"$dir/$sub"
      Purge.repairPartitionRewrite(spark, root)
      val rp = new org.apache.hadoop.fs.Path(root)
      val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val parts = fs.listStatus(rp).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("ingest=")).sorted
      if (parts.size <= 1) return
      val folded = spark.read.parquet(parts.map(p => s"$root/$p"): _*)
        .groupBy(keys.map(col): _*).agg(sum(col("c")).as("c"))
        .where(col("c") > 0)
        .repartition(1)
      val repl: Seq[(String, Option[DataFrame])] =
        ("ingest=-1" -> Some(folded)) +:
          parts.filter(_ != "ingest=-1").map(p => p -> Option.empty[DataFrame])
      Purge.rewritePartitions(spark, root, repl)
    }
    fold("unigrams", Seq("w"))
    fold("bigrams", Seq("w1", "w2"))
  }

  /** PRUNE the model for serving (the KenLM-style min-count cut): fold
    * every delta partition and drop n-grams whose total is below
    * `minCount` — pruned unigrams score as OOV, pruned bigrams back off,
    * exactly as if they had never been seen. The scoring invariant
    * `c(w1,w2) > 0 ⇒ c(w1) > 0` survives the cut for free: counts are
    * corpus-shaped through every build/grow/purge (each delta is the
    * unigram and bigram bag of the SAME rows), so `c(w1,w2) ≤ c(w1)`
    * always and a bigram clearing the floor implies its left endpoint
    * does too. One fused fold+floor rewrite per table (seed SWAP +
    * delta DROPs in a single two-phase commit — never a separate
    * compact pass); bigrams commit FIRST so a crash between the two
    * table commits leaves pruned bigrams over unpruned unigrams, which
    * keeps every kept bigram's denominator alive (the reverse order
    * could null it). Lossy by design — purges after a prune still
    * validate against the pruned counts, so only prune a model you
    * won't need to subtract pre-prune history from. */
  def pruneLmIndex(spark: SparkSession, dir: String, minCount: Long): Unit = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    requireFormat(spark, dir)
    repairAll(spark, dir)
    def foldFloor(sub: String, keys: Seq[String]): Unit = {
      val root = s"$dir/$sub"
      val rp = new org.apache.hadoop.fs.Path(root)
      val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val parts = fs.listStatus(rp).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("ingest=")).sorted
      val kept = spark.read.parquet(parts.map(p => s"$root/$p"): _*)
        .groupBy(keys.map(col): _*).agg(sum(col("c")).as("c"))
        .where(col("c") >= minCount)
        .repartition(1)
      val repl: Seq[(String, Option[DataFrame])] =
        ("ingest=-1" -> Some(kept)) +:
          parts.filter(_ != "ingest=-1").map(p => p -> Option.empty[DataFrame])
      Purge.rewritePartitions(spark, root, repl)
    }
    foldFloor("bigrams", Seq("w1", "w2"))
    foldFloor("unigrams", Seq("w"))
  }

  /** Read the live model: sum counts across delta partitions, drop
    * zeroed n-grams (a never-seen and a fully-purged n-gram must read
    * identically). Vocabulary-scale work. `excludeIngestBatch`: skip one
    * ingest partition — the streaming loop's own-partition exclusion, so
    * a crash-replayed grown micro-batch never scores against counts it
    * appended itself. */
  def readModel(spark: SparkSession, dir: String,
      excludeIngestBatch: Option[Long] = None): (DataFrame, DataFrame) = {
    requireFormat(spark, dir)
    repairAll(spark, dir)
    def table(sub: String, keys: Seq[String]): DataFrame = {
      val raw = spark.read.parquet(s"$dir/$sub")
      val visible = excludeIngestBatch match {
        case Some(id) => raw.where(col("ingest") =!= id)
        case None => raw
      }
      visible.groupBy(keys.map(col): _*).agg(sum(col("c")).as("c"))
        .where(col("c") > 0)
    }
    (table("unigrams", Seq("w")), table("bigrams", Seq("w1", "w2")))
  }

  /** Score a batch against the PERSISTED model — the per-arrival form:
    * one scan of the batch, vocabulary-scale reads of the model tables,
    * nothing training-corpus-scale anywhere. */
  def scoreAgainstLmIndex(indexDir: String, batch: DataFrame,
      excludeIngestBatch: Option[Long] = None): DataFrame = {
    val (uni, bi) = readModel(batch.sparkSession, indexDir, excludeIngestBatch)
    scoreWith(batch, uni, bi)
  }

  // ---- oracle SQL builders ------------------------------------------------

  /** Token-stream CTE body over `corpusSql` (a parenthesized SELECT of
    * (doc_id, text)): (doc_id, pos, w, w1) with 1-based pos — the
    * engine-standard DuckDB list-index pattern, prev token by index
    * arithmetic. Bound 1000 ≥ max tokens per doc in every fixture. */
  def tokenStreamSql(corpusSql: String): String =
    s"""(SELECT doc_id, i.i AS pos, ts[CAST(i.i AS INT)] AS w,
       |        CASE WHEN i.i > 1 THEN ts[CAST(i.i - 1 AS INT)] END AS w1
       | FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ts
       |       FROM $corpusSql)
       | JOIN range(1, 1001) i(i) ON i.i <= len(ts))""".stripMargin

  /** Full scoring SQL: train on `trainSql`, score `scoreSql` (both
    * parenthesized (doc_id, text) SELECTs) — replays [[ppl]] exactly.
    * `minCount` > 1 replays [[pruneLmIndex]]'s cut on both tables — a
    * bare count floor per table; the left-endpoint implication
    * `c(w1,w2) ≤ c(w1)` makes any endpoint join redundant (see
    * [[pruneLmIndex]]). Callers append their own ORDER BY / projection. */
  def pplSql(trainSql: String, scoreSql: String, minCount: Long = 1L): String =
    s"""WITH ttok AS (SELECT * FROM ${tokenStreamSql(trainSql)}),
       | uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM ttok GROUP BY 1
       |         HAVING count(*) >= $minCount),
       | bi AS (SELECT w1, w AS w2, CAST(count(*) AS BIGINT) AS c
       |        FROM ttok WHERE w1 IS NOT NULL GROUP BY 1, 2
       |        HAVING count(*) >= $minCount),
       | tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n,
       |                CAST(count(*) AS DOUBLE) AS v FROM uni),
       | stok AS (SELECT * FROM ${tokenStreamSql(scoreSql)}),
       | sc AS (SELECT s.doc_id,
       |   CASE WHEN s.w1 IS NULL
       |          THEN log10((coalesce(u2.c, 0) + 1.0) / (t.n + t.v))
       |        WHEN b.c IS NOT NULL
       |          THEN log10(b.c * 1.0 / u1.c)
       |        ELSE log10(${alpha} * (coalesce(u2.c, 0) + 1.0) / (t.n + t.v))
       |   END AS lp,
       |   CASE WHEN u2.c IS NULL THEN 1 ELSE 0 END AS oov,
       |   CASE WHEN s.w1 IS NOT NULL AND b.c IS NULL THEN 1 ELSE 0 END AS bko
       |  FROM stok s
       |  LEFT JOIN bi b ON b.w1 = s.w1 AND b.w2 = s.w
       |  LEFT JOIN uni u1 ON u1.w = s.w1
       |  LEFT JOIN uni u2 ON u2.w = s.w, tot t)
       | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |        CAST(sum(oov) AS BIGINT) AS n_oov,
       |        CAST(sum(bko) AS BIGINT) AS n_backoff,
       |        round(-sum(lp) / count(*), 6) AS xent
       | FROM sc GROUP BY doc_id""".stripMargin

  /** Oracle for [[gate]]: the ppl chain, the rounded cut, the per-lang
    * funnel. `batchLangSql` is a parenthesized (doc_id, text, lang)
    * SELECT (scoring tokenizes only doc_id/text from it). */
  def gateSql(trainSql: String, batchLangSql: String, maxXent: Double): String =
    s"""WITH scored AS (
       |  ${pplSql(trainSql, s"(SELECT doc_id, text FROM $batchLangSql b)")}
       | )
       | SELECT b.lang, CAST(count(*) AS BIGINT) AS n_in,
       |        CAST(sum(CASE WHEN s.xent IS NOT NULL AND s.xent <= $maxXent
       |                      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       | FROM $batchLangSql b LEFT JOIN scored s ON b.doc_id = s.doc_id
       | GROUP BY 1 ORDER BY 1""".stripMargin
}
