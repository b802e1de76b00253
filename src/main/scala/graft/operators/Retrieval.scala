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

  /** Persist the BM25 POSTINGS index — the "index once, query many"
    * form of [[bm25]] for serving workloads. Rows are fully DENORMALIZED
    * `(term, doc_id, tf, df, dl)` so a probe needs ZERO joins: the
    * corpus statistics each score needs travel with the posting. The
    * table is range-partitioned and sorted BY TERM, so a query's literal
    * `isin` predicate prunes at parquet row-group (min/max) level — the
    * columnar analogue of an inverted index's posting-list seek. Size:
    * one row per distinct (doc, term) — the standard inverted-index cost
    * class, on disk. `stats` holds the one (n_docs, avgdl) row. */
  def buildBm25Index(docs: DataFrame, dir: String, files: Int = 32): Unit = {
    val terms = docs.select(col("doc_id"), explode(toks).as("term"))
    val dl = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    val tfAgg = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df derives from the tf aggregate (one row per (doc, term) already)
    // and joins WITHOUT a broadcast hint: the full-corpus vocabulary is
    // corpus-proportional — at web scale it would blow the broadcast
    // limit — unlike bm25's per-QUERY df, which is tiny by construction
    val df = tfAgg.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tfAgg
      .join(df, "term")
      .join(dl, "doc_id")
      .select(col("term"), col("doc_id"), col("tf"), col("df"), col("dl"))
      .repartitionByRange(files, col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/postings")
  }

  /** [[bm25TopK]] against a prebuilt [[buildBm25Index]]: identical
    * result contract, but the probe is ONE postings scan with the term
    * filter PUSHED into parquet (row-group pruning on the sorted term
    * column), a broadcast of the 1-row stats, and a
    * TakeOrderedAndProject — no corpus scan, no tokenization, no joins.
    * The df stored per posting is docs-containing-the-term, identical to
    * [[bm25]]'s tf-derived df for every term that has postings at all
    * (a term with no postings contributes nothing either way). */
  def bm25IndexedTopK(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25IndexedTopK needs at least one query term")
    val post = spark.read.parquet(s"$dir/postings")
      .where(col("term").isin(queryTerms: _*))
    val stats = spark.read.parquet(s"$dir/stats")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    post.crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * col("tf") * lit(k1 + 1.0) / norm), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
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
