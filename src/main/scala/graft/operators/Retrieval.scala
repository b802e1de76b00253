package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse (BM25) retrieval and rank fusion — the lexical half of the
  * hybrid-search shape every retrieval-augmented training pipeline runs
  * next to the ANN operators in [[Similarity]]: score candidates by BM25
  * over exact terms, by cosine over embeddings, and fuse the two rankings
  * with reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009).
  * No reference precedent (`Preprocessing/src/main/java` has no retrieval
  * surface) — this is LLM-pipeline surface next to SURVEY §2's similarity
  * operators.
  *
  * Plan shape at 100 TB: the query's term set is a tiny LITERAL, so term
  * matching is an `isin` filter codegen'd into the scan stage (right
  * after the tokenizing Generate — no inverted index materialized, no
  * join against a term table); the corpus-wide statistics BM25 needs
  * (N, avgdl, per-term df) are metadata-scale aggregates (df has one row
  * per QUERY term); the final top-k is a `TakeOrderedAndProject`, never a
  * global sort. The only corpus-scale shuffle is the per-doc length
  * aggregate, which is map-side combinable.
  */
object Retrieval {

  private def toks: Column = split(col("text"), " ")

  /** Okapi BM25 scores for a bag-of-terms query over `docs(doc_id, text)`:
    *
    *   score(D) = Σ_t  idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    *   idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
    *
    * (the Lucene non-negative idf form). Document length |D| and `avgdl`
    * count whitespace tokens with the same tokenizer as
    * [[TextAnalysis.tfidf]]. Returns one row per document containing at
    * least one query term: `(doc_id, score)` with `score` rounded to 6
    * decimals; total-order the caller's top-k on `(score DESC, doc_id)`.
    *
    * Scale: `queryTerms` is a literal `isin` predicate — the tf aggregate
    * runs on the MATCHING rows only and its filter reaches the scan; df
    * and (N, avgdl) are metadata-scale and enter through broadcast
    * (crossJoin of a 1-row aggregate; |queryTerms|-row df join). */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val terms = docs.select(col("doc_id"), explode(toks).as("term"))
    val dl = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // one metadata-scale row: corpus size and mean doc length
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = terms
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // df per QUERY term (≤ |queryTerms| rows): docs containing the term
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    tf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * col("tf") * lit(k1 + 1.0) / norm), 6).as("score"))
  }

  /** BM25 top-k: total-ordered on `(score DESC, doc_id)` — a
    * `TakeOrderedAndProject`, not a global sort. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25(docs, queryTerms, k1, b)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  // ---- persisted BM25 index (grows by append) ---------------------------
  //
  // Layout:
  //   dir/postings/batch=<id>/  (term, doc_id, tf, dl) range-partitioned
  //                             + sorted BY TERM — a query's literal isin
  //                             prunes at parquet row-group level, the
  //                             columnar analogue of a posting-list seek
  //   dir/v<k>/df/              (term, df) sorted by term — df and stats
  //   dir/v<k>/stats/           (n_docs, sum_dl), one row    are GLOBAL,
  //   dir/v<k>/_batches         covered batch ids            so they are
  //   dir/v<k>/_COMMIT          written LAST                 VERSIONED
  //
  // Why df/stats live beside the postings instead of denormalized into
  // them (the r11 layout): df is global, so ANY append changes it for
  // every touched term — a denormalized df would force rewriting every
  // posting of every touched term on every append. Versioned side tables
  // make an append O(batch + vocabulary): the standing postings are never
  // read, re-tokenized or rewritten. The probe pays one extra join, but
  // against a ≤|queryTerms|-row broadcast — never corpus-scale.
  //
  // Crash discipline (the buildExactWindowIndex lesson): a version
  // without _COMMIT is invisible; postings/batch dirs are keyed
  // overwrites (replays converge); a crash between the postings write
  // and the version commit leaves a stray batch dir that the old
  // committed version simply does not list — probes stay consistent and
  // the retried append overwrites it.

  private def committedVersion(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Long, Seq[Long], org.apache.hadoop.fs.FileSystem) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(root).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("v") &&
        p.getName.drop(1).forall(_.isDigit) &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "_COMMIT")))
      .sortBy(_.getName.drop(1).toLong)
    require(versions.nonEmpty, s"no committed BM25 index version under $dir")
    val latest = versions.last
    val batches = readText(fs, new org.apache.hadoop.fs.Path(latest, "_batches"))
      .trim.split(",").map(_.toLong).toSeq
    (latest.getName.drop(1).toLong, batches, fs)
  }

  private def readText(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def writeText(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** The version's takedown table (`purged` or `registry`) as a doc-id
    * DataFrame — absent dir = empty set (pre-lifecycle versions). */
  private def versionIdTable(spark: org.apache.spark.sql.SparkSession,
      dir: String, v: Long, name: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/v$v/$name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(p.toString).select(col("doc_id"))
    else spark.range(0).select(col("id").as("doc_id"))
  }

  /** Fail fast on NULL text before any index write: a null-text doc
    * explodes to ZERO postings rows, so it would be silently absent from
    * the index while present in its batch — and a committed streaming
    * batch containing one could never be replayed (the replay doc-set
    * guard derives the committed ids from the postings partition, which
    * excludes the doc; a faithful resubmission would be refused forever).
    * One pushed-IsNull `limit(1)` probe over the batch/corpus — never the
    * standing index. */
  private def requireNonNullText(docs: DataFrame, op: String): Unit = {
    val bad = docs.where(col("text").isNull)
      .select(col("doc_id")).limit(1).collect()
    require(bad.isEmpty,
      s"$op: doc_id ${bad.headOption.map(_.get(0)).getOrElse("?")} has NULL " +
        "text — a null-text doc contributes no postings and would make its " +
        "batch unreplayable; drop it or submit empty text upstream")
  }

  /** One tokenization pass → the batch's postings `(term, doc_id, tf,
    * dl)` and its `(term, df)` / `(n_docs, sum_dl)` contributions. */
  private def batchTables(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val terms = docs.select(col("doc_id"), explode(toks).as("term"))
    val dl = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tfAgg = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val postings = tfAgg.join(dl, "doc_id")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    // df derives from the tf aggregate (one row per (doc, term) already);
    // the (term → df) table is vocabulary-scale, never broadcast on write
    val df = tfAgg.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // sum_dl is an exact integer, so the derived avgdl = sum_dl / n_docs
    // is reproducible under any append order (a stored float mean would
    // drift from the rebuilt one by accumulation order)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    (postings, df, stats)
  }

  private def writePostings(postings: DataFrame, dir: String, id: Long,
      files: Int): Unit =
    postings
      .repartitionByRange(files, col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/postings/batch=$id")

  private def commitVersion(spark: org.apache.spark.sql.SparkSession,
      dir: String, v: Long, df: DataFrame, stats: DataFrame,
      batches: Seq[Long], dfFiles: Int,
      purged: Option[DataFrame] = None,
      registry: Option[DataFrame] = None): Unit = {
    df.repartitionByRange(math.max(1, dfFiles), col("term"))
      .sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$dir/v$v/df")
    stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/v$v/stats")
    // takedown state rides the version commit (atomic with df/stats):
    // purged/ = ids logically removed but physically still in postings
    // (probes anti-join them); registry/ = every id EVER purged (replay
    // subtraction + re-ingest refusal). Absent dirs mean empty sets —
    // versions from before the purge lifecycle read as purge-free.
    purged.foreach(_.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/v$v/purged"))
    registry.foreach(_.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/v$v/registry"))
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    writeText(fs, new org.apache.hadoop.fs.Path(s"$dir/v$v/_batches"),
      batches.mkString(","))
    writeText(fs, new org.apache.hadoop.fs.Path(s"$dir/v$v/_COMMIT"), "")
    // prune: the newest version plus its predecessor are all recovery
    // can need (committedSnapshots' discipline)
    fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("v") &&
        p.getName.drop(1).forall(_.isDigit) &&
        p.getName.drop(1).toLong < v - 1)
      .foreach(p => fs.delete(p, true))
  }

  /** Persist the BM25 index — the "index once, query many" form of
    * [[bm25]] for serving workloads, growable by [[appendToBm25Index]].
    * Size: one postings row per distinct (doc, term) — the standard
    * inverted-index cost class, on disk — plus a vocabulary-scale df
    * table and a 1-row stats table (versioned; see layout note above). */
  def buildBm25Index(docs: DataFrame, dir: String, files: Int = 32): Unit = {
    val spark = docs.sparkSession
    requireNonNullText(docs, "buildBm25Index")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    val (postings, df, stats) = batchTables(docs)
    writePostings(postings, dir, -1L, files)
    commitVersion(spark, dir, 0L, df, stats, Seq(-1L), files / 4)
  }

  /** Grow a [[buildBm25Index]] index with an arriving batch WITHOUT
    * re-tokenizing or rewriting the standing corpus: write the batch's
    * own postings partition, merge its per-term df into a new df
    * version (df is global — an append must re-aggregate it; the merge
    * is vocabulary-scale), roll (n_docs, sum_dl) forward exactly
    * (integer sums — no float-mean drift), and commit the new version.
    * Grown == rebuilt, by construction and spec (RetrievalSpec).
    *
    * Batch ids: the batch API auto-assigns ids descending below the
    * build's -1 (-2, -3, …), DISJOINT from streaming ingest ids (≥ 0,
    * passed via `batchId` by [[graft.streaming.Streams.bm25Ingest]]) —
    * the id-space discipline appendToExactWindowIndex settled in r11.
    * A `batchId` already committed is a REPLAY (foreachBatch is
    * at-least-once): the batch's postings partition is overwritten with
    * the identical data and df/stats are left alone — they already
    * include this batch.
    *
    * Doc ids must be globally unique across the index: a collision
    * would double-count the doc in df and stats, so the append fails
    * fast (one postings id-column scan against the broadcast batch ids
    * — no shuffle, the curationLoop guard). */
  def appendToBm25Index(docs: DataFrame, dir: String,
      batchId: Option[Long] = None, files: Int = 8): Unit = {
    val spark = docs.sparkSession
    requireNonNullText(docs, "appendToBm25Index")
    val (v, batches, _) = committedVersion(spark, dir)
    batchId.foreach(id => require(id >= 0,
      s"explicit batch id $id is negative — negative ids belong to the batch API"))
    val id = batchId.getOrElse(batches.filter(_ < 0).min - 1)
    val registry = versionIdTable(spark, dir, v, "registry")
    if (batches.contains(id)) {
      // Replay of a committed streaming batch: postings only (see above) —
      // but assert the replay really IS the committed data first. A
      // committed batchId resubmitted with DIFFERENT docs would silently
      // desynchronize postings from the committed df/stats. The guard is
      // batch-partition-scale (one aggregate over the one partition, one
      // over the batch — never the standing index), and doc-id-set exact
      // up to xor collision: distinct count + min/max + the order-free
      // `bit_xor` fold of the distinct ids (partial-aggregable — no
      // driver-side set, no sort).
      val sig = (d: DataFrame) => d.select(col("doc_id")).distinct().agg(
          count(lit(1)).as("n"),
          min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
          expr("bit_xor(doc_id)").as("x"))
        .collect()(0)
      // Purged docs are subtracted from BOTH sides before the compare: a
      // faithful replay resubmits the ORIGINAL batch, but a purge (+
      // compaction) may have removed some of its docs from the committed
      // partition — the replay is still faithful if the sets agree modulo
      // the registry. The rewritten partition likewise excludes them, so
      // a replay can never resurrect a purged doc's postings.
      val committed = sig(spark.read.parquet(s"$dir/postings/batch=$id")
        .join(broadcast(registry), Seq("doc_id"), "left_anti"))
      val replayed = sig(docs.select(col("doc_id"))
        .join(broadcast(registry), Seq("doc_id"), "left_anti"))
      require(committed == replayed,
        s"appendToBm25Index: batch $id is already committed with a " +
          s"different doc set ($committed vs replay $replayed) — a replay " +
          "must resubmit the committed batch unchanged")
      writePostings(batchTables(
        docs.join(broadcast(registry), Seq("doc_id"), "left_anti"))._1,
        dir, id, files)
      return
    }
    // Takedown registry: a NEW batch containing an ever-purged id is
    // refused loudly — re-ingesting removed content is exactly what a
    // takedown must prevent, and silently re-adding it would also break
    // the purged==rebuilt-without invariant.
    val resurrected = docs.select(col("doc_id"))
      .join(broadcast(registry), Seq("doc_id"), "left_semi")
      .limit(1).collect()
    require(resurrected.isEmpty,
      s"appendToBm25Index: doc_id ${resurrected.headOption.map(_.get(0))
        .getOrElse("?")} was purged from this index — re-ingesting a " +
        "taken-down doc is refused (new id required if intentional)")
    val indexed = spark.read
      .parquet(batches.map(b => s"$dir/postings/batch=$b"): _*)
      .select(col("doc_id"))
      .join(broadcast(docs.select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .limit(1).collect()
    require(indexed.isEmpty,
      s"appendToBm25Index: doc_id ${indexed.head.getLong(0)} is already " +
        "indexed — the BM25 index requires globally unique doc ids")
    val (postings, dfNew, statsNew) = batchTables(docs)
    writePostings(postings, dir, id, files)
    val dfOld = spark.read.parquet(s"$dir/v$v/df")
    val dfMerged = dfOld.unionAll(dfNew)
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val statsOld = spark.read.parquet(s"$dir/v$v/stats")
    val statsMerged = statsOld.unionAll(statsNew)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    // takedown state carries forward unchanged across appends (must be
    // materialized: the version prune may delete the dir the lazy plan
    // would read)
    commitVersion(spark, dir, v + 1, dfMerged, statsMerged, batches :+ id,
      math.max(1, files / 4),
      purged = Some(versionIdTable(spark, dir, v, "purged").localCheckpoint(true)),
      registry = Some(registry.localCheckpoint(true)))
  }

  /** Owner-side SESSION over a [[buildBm25Index]] layout for
    * [[graft.streaming.Streams.bm25Ingest]] — the
    * [[graft.operators.Dedup.CrossIndexSession]] pattern on the
    * retrieval ladder. While the ingest loop runs it is the index's only
    * writer (the loop's documented ownership), so the version-chain
    * inputs every append re-read from the filesystem are cached and
    * rolled forward in memory instead:
    *   - `(v, batches)` — `committedVersion`'s root listing per batch;
    *   - the vocabulary-scale df table and 1-row stats of the newest
    *     version (each append must still re-AGGREGATE df — document
    *     frequency is global by definition — but stops re-READING it
    *     from parquet; the merged result is checkpointed ONCE and serves
    *     both the version write and the next batch's input);
    *   - the takedown purged/registry id tables (takedown-scale);
    *   - the DISTINCT indexed doc-id set (8 bytes per doc) for the
    *     id-collision guard, replacing the all-partitions postings
    *     id-column scan (the index's biggest table, scanned per append).
    * Caches advance ONLY after `commitVersion` returns, so a failed
    * append retries against exactly the state the filesystem holds; a
    * replayed batch id takes the postings-only replay branch unchanged.
    * `close()` drops every cache (checkpoint blocks are GC-reclaimed);
    * the loop wires it to its query-termination listener. */
  final class Bm25Session private[operators] (
      spark: org.apache.spark.sql.SparkSession, dir: String, files: Int = 8,
      rebaseEvery: Int = 32) {
    private final case class St(v: Long, batches: Seq[Long], df: DataFrame,
      stats: DataFrame, purged: DataFrame, registry: DataFrame, ids: DataFrame)
    private var st: St = null
    private var appends = 0

    private def state(): St = {
      if (st == null) {
        val (v, batches, _) = committedVersion(spark, dir)
        st = St(v, batches,
          graft.operators.Dedup.checkpointed(
            spark.read.parquet(s"$dir/v$v/df")),
          graft.operators.Dedup.checkpointed(
            spark.read.parquet(s"$dir/v$v/stats")),
          graft.operators.Dedup.checkpointed(versionIdTable(spark, dir, v, "purged")),
          graft.operators.Dedup.checkpointed(versionIdTable(spark, dir, v, "registry")),
          graft.operators.Dedup.checkpointed(spark.read
            .parquet(batches.map(b => s"$dir/postings/batch=$b"): _*)
            .select(col("doc_id")).distinct()))
      }
      st
    }

    /** [[appendToBm25Index]] with the session's cached version chain —
      * identical guards, replay branch, write order and commit. */
    def append(docs: DataFrame, batchId: Long): Unit = {
      requireNonNullText(docs, "Bm25Session.append")
      require(batchId >= 0,
        s"streaming ingest batch id $batchId is negative — negative ids " +
          "belong to the batch API")
      val s = state()
      if (s.batches.contains(batchId)) {
        // replay: postings only, asserted identical modulo the registry
        // (appendToBm25Index's branch verbatim, registry from cache)
        val sig = (d: DataFrame) => d.select(col("doc_id")).distinct().agg(
            count(lit(1)).as("n"),
            min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
            expr("bit_xor(doc_id)").as("x"))
          .collect()(0)
        val committed = sig(spark.read.parquet(s"$dir/postings/batch=$batchId")
          .join(broadcast(s.registry), Seq("doc_id"), "left_anti"))
        val replayed = sig(docs.select(col("doc_id"))
          .join(broadcast(s.registry), Seq("doc_id"), "left_anti"))
        require(committed == replayed,
          s"Bm25Session.append: batch $batchId is already committed with a " +
            s"different doc set ($committed vs replay $replayed) — a replay " +
            "must resubmit the committed batch unchanged")
        writePostings(batchTables(
          docs.join(broadcast(s.registry), Seq("doc_id"), "left_anti"))._1,
          dir, batchId, files)
        return
      }
      val resurrected = docs.select(col("doc_id"))
        .join(broadcast(s.registry), Seq("doc_id"), "left_semi")
        .limit(1).collect()
      require(resurrected.isEmpty,
        s"Bm25Session.append: doc_id ${resurrected.headOption.map(_.get(0))
          .getOrElse("?")} was purged from this index — re-ingesting a " +
          "taken-down doc is refused (new id required if intentional)")
      val indexed = s.ids
        .join(broadcast(docs.select(col("doc_id")).distinct()),
          Seq("doc_id"), "left_semi")
        .limit(1).collect()
      require(indexed.isEmpty,
        s"Bm25Session.append: doc_id ${indexed.head.getLong(0)} is already " +
          "indexed — the BM25 index requires globally unique doc ids")
      val (postings, dfNew, statsNew) = batchTables(docs)
      writePostings(postings, dir, batchId, files)
      // ONE materialization of the merged tables serves the version write
      // AND the next batch's cached input
      val dfMerged = graft.operators.Dedup.checkpointed(
        s.df.unionAll(dfNew).groupBy(col("term")).agg(sum(col("df")).as("df")))
      val statsMerged = graft.operators.Dedup.checkpointed(
        s.stats.unionAll(statsNew)
          .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl")))
      commitVersion(spark, dir, s.v + 1, dfMerged, statsMerged,
        s.batches :+ batchId, math.max(1, files / 4),
        purged = Some(s.purged), registry = Some(s.registry))
      val newIds = graft.operators.Dedup.checkpointed(
        docs.select(col("doc_id")).distinct())
      val ids =
        if ((appends + 1) % rebaseEvery == 0)
          s.ids.unionAll(newIds).localCheckpoint(true) // bound plan depth
        else s.ids.unionAll(newIds)
      appends += 1
      st = St(s.v + 1, s.batches :+ batchId, dfMerged, statsMerged,
        s.purged, s.registry, ids)
    }

    /** Drop every cache (checkpoint blocks are GC-reclaimed). */
    def close(): Unit = { st = null }
  }

  /** Open a [[Bm25Session]] over an existing index layout. */
  def openBm25Session(spark: org.apache.spark.sql.SparkSession, dir: String,
      files: Int = 8): Bm25Session = new Bm25Session(spark, dir, files)

  /** [[bm25TopK]] against a prebuilt [[buildBm25Index]] (+appends):
    * identical result contract, but the probe reads ONLY the index —
    * the committed version's postings partitions with the term filter
    * PUSHED into parquet (row-group pruning on the sorted term column),
    * the ≤|queryTerms|-row df slice (same pushdown, then broadcast),
    * and the 1-row stats broadcast; top-k is a TakeOrderedAndProject.
    * No corpus scan, no tokenization, no corpus-scale join. */
  def bm25IndexedTopK(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25IndexedTopK needs at least one query term")
    val (v, batches, fs) = committedVersion(spark, dir)
    // logical-purge mask: ids removed from df/stats but physically still
    // in the postings until compaction — the anti-join is against the
    // TERM-PRUNED slice only (and absent entirely on a purge-free or
    // freshly-compacted version), so its cost is candidate-scale
    val purgedDir = new org.apache.hadoop.fs.Path(s"$dir/v$v/purged")
    val post0 = spark.read
      .parquet(batches.map(b => s"$dir/postings/batch=$b"): _*)
      .where(col("term").isin(queryTerms: _*))
    val post =
      if (fs.exists(purgedDir))
        post0.join(
          broadcast(spark.read.parquet(purgedDir.toString).select(col("doc_id"))),
          Seq("doc_id"), "left_anti")
      else post0
    val dfq = spark.read.parquet(s"$dir/v$v/df")
      .where(col("term").isin(queryTerms: _*))
    val stats = spark.read.parquet(s"$dir/v$v/stats")
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    post.join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * col("tf") * lit(k1 + 1.0) / norm), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** PURGE a doc-id set from a [[buildBm25Index]] index — the takedown
    * verb of the BM25 ladder (build → append → stream → purge): after the
    * call, every probe scores exactly as an index built without the docs
    * (oracle-asserted), at O(one postings id/term/dl-column scan +
    * vocabulary merge) cost — never a corpus re-tokenization.
    *
    * LOGICAL purge, physical deferral: the global df/(n_docs, sum_dl)
    * roll-back and the `purged`/`registry` id tables commit atomically as
    * version v+1 (the `_COMMIT`-last discipline — a crash at any point
    * leaves v intact and v+1 invisible); the purged docs' postings ROWS
    * stay on disk until [[compactBm25Postings]] rewrites the touched
    * partitions, and probes mask them with a candidate-scale anti-join
    * meanwhile. This is the tombstone-then-compact split every big
    * purge needs at 100 TB: a takedown of K docs may touch EVERY
    * postings partition, and deferring the rewrite keeps the legal
    * deadline on the cheap commit, not the big I/O.
    *
    * Exact arithmetic: the subtraction terms come from the index's OWN
    * postings rows for the purged ids (per-term df counts, per-doc dl),
    * so df/n_docs/sum_dl roll back by integers to exactly the values a
    * from-scratch build of the surviving corpus computes. Ids already
    * purged (or never indexed) subtract nothing — re-purging is
    * idempotent, and a takedown list may cite docs the index never held.
    * Every requested id enters the permanent `registry`: appends refuse
    * it forever (re-ingesting taken-down content is the failure mode a
    * registry exists to stop) and replays subtract it. */
  def purgeFromBm25Index(spark: org.apache.spark.sql.SparkSession,
      dir: String, docIds: DataFrame, files: Int = 8): Unit = {
    val (v, batches, _) = committedVersion(spark, dir)
    val ids = docIds.select(col("doc_id")).distinct().localCheckpoint(true)
    val purgedOld = versionIdTable(spark, dir, v, "purged")
    val registryOld = versionIdTable(spark, dir, v, "registry")
    // subtraction basis: postings of requested ids STILL LIVE in the index
    // (not already purged) — one narrow scan of the postings, via the same
    // broadcast discipline as the append path's uniqueness guard
    val live = spark.read
      .parquet(batches.map(b => s"$dir/postings/batch=$b"): _*)
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
      .join(broadcast(purgedOld), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("term"), col("dl"))
      .localCheckpoint(true) // three aggregates below share one scan
    val dfSub = live.groupBy(col("term")).agg(count(lit(1)).as("df_sub"))
    val dlPerDoc = live.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
    val statsSub = dlPerDoc
      .agg(count(lit(1)).as("n_sub"), sum(col("dl")).as("dl_sub"))
    val dfOld = spark.read.parquet(s"$dir/v$v/df")
    val dfNew = dfOld.join(dfSub, Seq("term"), "left")
      .select(col("term"),
        (col("df") - coalesce(col("df_sub"), lit(0L))).as("df"))
      .where(col("df") > 0) // a term whose last doc purged leaves the vocab
    val statsOld = spark.read.parquet(s"$dir/v$v/stats")
    val statsNew = statsOld.crossJoin(broadcast(statsSub))
      .select((col("n_docs") - coalesce(col("n_sub"), lit(0L))).as("n_docs"),
        (col("sum_dl") - coalesce(col("dl_sub"), lit(0L))).as("sum_dl"))
    val purgedNew = purgedOld
      .unionAll(dlPerDoc.select(col("doc_id")))
      .distinct().localCheckpoint(true)
    val registryNew = registryOld.unionAll(ids).distinct().localCheckpoint(true)
    commitVersion(spark, dir, v + 1, dfNew, statsNew, batches,
      math.max(1, files / 4),
      purged = Some(purgedNew), registry = Some(registryNew))
  }

  /** The PHYSICAL half of the BM25 takedown: rewrite exactly the postings
    * partitions that still hold purged docs' rows (anti-join, term-sort
    * preserved) under [[Purge.rewritePartitions]]'s two-phase commit,
    * then commit a version whose `purged` set is empty — probes drop the
    * anti-join mask and the bytes are actually gone (the part a PII
    * erasure audit checks). df/stats/registry/batch list are untouched:
    * they were already exact from the logical purge.
    *
    * Crash windows (PurgeSpec): inside the partition rewrite, the
    * rewrite's own marker protocol repairs; between the rewrite and the
    * version commit, probes still mask via v's `purged` table (the rows
    * it masks are simply gone — the anti-join is a no-op) and a rerun
    * finds nothing left to rewrite and just commits the empty-purged
    * version. Owner-only, like [[graft.operators.Layout.compactKeyed]]. */
  def compactBm25Postings(spark: org.apache.spark.sql.SparkSession,
      dir: String, files: Int = 8): Unit = {
    Purge.repairPartitionRewrite(spark, s"$dir/postings")
    val (v, batches, _) = committedVersion(spark, dir)
    val purged = versionIdTable(spark, dir, v, "purged").localCheckpoint(true)
    if (purged.isEmpty) return // nothing logically purged — no-op
    val touched = spark.read.parquet(s"$dir/postings")
      .join(broadcast(purged), Seq("doc_id"), "left_semi")
      .select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    if (touched.nonEmpty) {
      val replacements = touched.toSeq.map { b =>
        val remaining = spark.read.parquet(s"$dir/postings/batch=$b")
          .join(broadcast(purged), Seq("doc_id"), "left_anti")
          .select(col("term"), col("doc_id"), col("tf"), col("dl"))
          .localCheckpoint(true) // the swap deletes the dir this plan reads
        // always SWAP, never DROP: probes read the version's batch list as
        // explicit paths, so an emptied partition keeps its (empty) dir
        s"batch=$b" -> Some(remaining)
      }
      Purge.rewritePartitions(spark, s"$dir/postings", replacements,
        writeStage = (df, path) => df
          .repartitionByRange(files, col("term"))
          .sortWithinPartitions(col("term"), col("doc_id"))
          .write.mode("overwrite").parquet(path))
    }
    commitVersion(spark, dir, v + 1,
      spark.read.parquet(s"$dir/v$v/df").localCheckpoint(true),
      spark.read.parquet(s"$dir/v$v/stats").localCheckpoint(true),
      batches, math.max(1, files / 4),
      purged = Some(purged.limit(0)),
      registry = Some(versionIdTable(spark, dir, v, "registry")
        .localCheckpoint(true)))
  }

  /** Fold the index's accumulated postings `batch=` partitions into ONE
    * re-based bulk partition — the append-side compaction verb
    * ([[compactBm25Postings]] is the PURGE-side one: it rewrites touched
    * partitions but never reduces their count). Streaming ingest writes a
    * partition per micro-batch forever, so after 10⁴ batches every probe
    * pays a 10⁴-path read plan; this fold restores O(1) partitions with
    * byte-identical probe results. The fold preserves the term-range
    * sort (`repartitionByRange` + `sortWithinPartitions`), so row-group
    * pruning on pushed term filters survives — and usually improves,
    * since the term ranges re-tighten over the union.
    *
    * Commit order keeps probes valid at every instant: (1) the folded
    * partition writes under a FRESH batch id (below every existing id —
    * unreferenced by any committed version, invisible); (2) version v+1
    * commits with the batch list [newId] (`_COMMIT`-last — before it,
    * probes read v over the still-intact old partitions; after it, v+1
    * over the fold); (3) the old partitions delete — pure GC, since v is
    * only ever read if v+1 is uncommitted, which step 2 made impossible.
    * A rerun converges from any crash point: the same newId recomputes
    * (batches unchanged ⇒ same min), the fold overwrites, and the
    * entry-time sweep clears partitions no committed version references.
    * df/stats/purged/registry carry forward untouched — a fold moves
    * rows, it never changes a count.
    *
    * Streaming caveat (Layout.compactKeyed's): fold only while the
    * owning stream is stopped and past its last checkpoint commit — a
    * replayed micro-batch whose partition was folded is no longer in
    * the batch list, so the append path would refuse it as an id
    * collision (loudly, but the stream is stuck until re-seeded). */
  def compactBm25Batches(spark: org.apache.spark.sql.SparkSession,
      dir: String, files: Int = 32): Unit = {
    val (v, batches, fs) = committedVersion(spark, dir)
    // entry GC: postings partitions the committed version doesn't list
    // are garbage from an interrupted fold (or an uncommitted append) —
    // clear them so a crashed deletion phase converges on rerun
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/postings")).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("batch=") &&
        !batches.contains(p.getName.stripPrefix("batch=").toLong))
      .foreach(p => fs.delete(p, true))
    if (batches.size <= 1) return // already a single base
    val newId = batches.min - 1
    spark.read.parquet(batches.map(b => s"$dir/postings/batch=$b"): _*)
      .repartitionByRange(files, col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/postings/batch=$newId")
    commitVersion(spark, dir, v + 1,
      spark.read.parquet(s"$dir/v$v/df").localCheckpoint(true),
      spark.read.parquet(s"$dir/v$v/stats").localCheckpoint(true),
      Seq(newId), math.max(1, files / 4),
      purged = Some(versionIdTable(spark, dir, v, "purged")
        .localCheckpoint(true)),
      registry = Some(versionIdTable(spark, dir, v, "registry")
        .localCheckpoint(true)))
    batches.foreach(b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/postings/batch=$b"), true))
  }

  /** Batch BM25 retrieval: exact top-`k` docs PER QUERY in ONE corpus
    * pass — the lexical sibling of [[Similarity.knnJoin]].
    * `queries(query_id, terms: ARRAY<STRING>)` is a SMALL table (a
    * request batch), broadcast twice: once as the distinct term set that
    * restricts the corpus tf aggregate (rows matching no query vanish in
    * the scan stage), once to fan matched terms out to the queries that
    * asked for them. Per-query top-k runs through the [[graft.functions
    * .TopK]] Aggregator — shuffle volume O(queries × k) regardless of
    * corpus size, never a window sort over all scored rows. Scores are
    * rounded to 6 decimals BEFORE the top-k so both engines cut the same
    * boundary; `rk` is row_number semantics on (score DESC, doc_id). */
  def bm25Join(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = queries
      .select(col("query_id"), explode(col("terms")).as("term")).distinct()
    val terms = docs.select(col("doc_id"), explode(toks).as("term"))
    val dl = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = terms
      .join(broadcast(qt.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    tf
      .join(broadcast(qt), "term")
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(idf * col("tf") * lit(k1 + 1.0) / norm), 6).as("score"))
      .select(col("query_id"), col("doc_id"), col("score"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new graft.functions.TopK(k).toColumn.name("top"))
      .toDF("query_id", "top")
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e._1").as("doc_id"), col("e._2").as("score"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** Reciprocal-rank fusion of already-truncated rankings: each input is
    * `(id, …)` ALREADY in its final rank order's top-n (so every input is
    * candidate-scale, not corpus-scale — the fusion input is the OUTPUT of
    * two top-k operators), and each id's fused score is Σ_r 1/(c + rank_r)
    * over the rankings that contain it (Cormack et al. 2009; c = 60 is
    * the paper's constant). Ranks are assigned by each input's
    * `orderCols` total order, so fusion is exactly reproducible: integer
    * ranks, no float comparisons across engines.
    *
    * The `Window.orderBy` single-partition shuffle here is CORRECT, not a
    * scale smell: it runs on ≤ n rows per ranking (top-k output), never
    * on a corpus. */
  def rrfFuse(rankings: Seq[(DataFrame, Seq[Column])], idCol: String,
      k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val ranked = rankings.zipWithIndex.map { case ((df, orderCols), i) =>
      df.select(col(idCol),
        // BIGINT like every other rank column (the oracle casts too — an
        // INT32 here breaks the driver's type-sensitive schema compare)
        row_number().over(Window.orderBy(orderCols: _*))
          .cast("long").as(s"rank_$i"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val fused = ranked.indices
      .map(i => when(col(s"rank_$i").isNotNull,
        lit(1.0) / (lit(c) + col(s"rank_$i"))).otherwise(lit(0.0)))
      .reduce(_ + _)
    joined
      .select(col(idCol) +: round(fused, 6).as("rrf") +:
        ranked.indices.map(i => col(s"rank_$i")): _*)
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}
