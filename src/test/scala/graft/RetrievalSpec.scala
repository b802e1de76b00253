package graft

import graft.operators.{Retrieval, Similarity}
import org.apache.spark.sql.functions._

class RetrievalSpec extends TestBase {

  import spark.implicits._

  test("bm25: hand-computed scores on a 3-doc corpus") {
    // corpus: dl = 4, 4, 4 -> avgdl = 4, N = 3
    val docs = Seq(
      (0L, "spark is very fast"),    // tf(spark)=1
      (1L, "spark spark and spark"), // tf(spark)=3
      (2L, "ducks like the pond")    // no query term
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, Seq("spark"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    // df(spark) = 2: idf = ln(1 + (3 - 2 + 0.5) / 2.5) = ln(1.6)
    val idf = math.log(1.6)
    // dl/avgdl = 1 -> norm = tf + k1 = tf + 1.2
    val s1 = BigDecimal(idf * 1 * 2.2 / (1 + 1.2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s3 = BigDecimal(idf * 3 * 2.2 / (3 + 1.2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.length == 2, "doc without any query term must not appear")
    assert(got(0) == (0L, s1) && got(1) == (1L, s3))
    // more occurrences => higher score, with tf saturation (not 3x)
    assert(got(1)._2 > got(0)._2 && got(1)._2 < 3 * got(0)._2)
  }

  test("bm25: longer documents are penalized at equal tf") {
    val docs = Seq(
      (0L, "spark a b c"),
      (1L, "spark " + Seq.fill(40)("filler").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, Seq("spark"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    assert(got(0)._2 > got(1)._2,
      s"short doc must outscore long doc at equal tf: ${got.toSeq}")
  }

  test("bm25TopK: literal term filter reaches the scan; top-k is TakeOrdered") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val plan = Retrieval.bm25TopK(docs, Seq("spark", "window"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrderedAndProject, not a global sort:\n$plan")
    val rows = Retrieval.bm25TopK(docs, Seq("spark", "window"), 10).collect()
    assert(rows.length == 10)
  }

  test("bm25IndexedTopK: identical to the direct operator; term filter pushed to the scan") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Retrieval.buildBm25Index(docs, dir)
    for (terms <- Seq(Seq("spark"), Seq("window", "merge"), Seq("spark", "stream", "vector"))) {
      val direct = Retrieval.bm25TopK(docs, terms, 15).as[(Long, Double)].collect().toSeq
      val indexed = Retrieval.bm25IndexedTopK(spark, dir, terms, 15)
        .as[(Long, Double)].collect().toSeq
      assert(indexed == direct, s"terms $terms: $indexed vs $direct")
    }
    val plan = Retrieval.bm25IndexedTopK(spark, dir, Seq("spark", "merge"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term predicate must push into the postings scan:\n$plan")
  }

  test("appendToBm25Index: grown == rebuilt for every term set; versions roll") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val grownDir = java.nio.file.Files.createTempDirectory("bm25grown").toString
    val fullDir = java.nio.file.Files.createTempDirectory("bm25full").toString
    Retrieval.buildBm25Index(docs.where(col("doc_id") < 200), grownDir)
    Retrieval.appendToBm25Index(
      docs.where(col("doc_id") >= 200 && col("doc_id") < 350), grownDir)
    Retrieval.appendToBm25Index(docs.where(col("doc_id") >= 350), grownDir)
    Retrieval.buildBm25Index(docs, fullDir)
    for (terms <- Seq(Seq("spark"), Seq("window", "merge"), Seq("the", "a"))) {
      val grown = Retrieval.bm25IndexedTopK(spark, grownDir, terms, 25)
        .as[(Long, Double)].collect().toSeq
      val rebuilt = Retrieval.bm25IndexedTopK(spark, fullDir, terms, 25)
        .as[(Long, Double)].collect().toSeq
      assert(grown == rebuilt, s"terms $terms: grown != rebuilt")
    }
    // two appends = two version rolls; only the newest two survive pruning
    val vs = new java.io.File(grownDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v")).map(_.getName).sorted
    assert(vs.toSeq == Seq("v1", "v2"), s"versions: ${vs.toSeq}")
  }

  test("appendToBm25Index: doc-id collision fails fast; explicit negative id rejected") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val dir = java.nio.file.Files.createTempDirectory("bm25coll").toString
    Retrieval.buildBm25Index(docs.where(col("doc_id") < 100), dir)
    val e = intercept[IllegalArgumentException] {
      Retrieval.appendToBm25Index(docs.where(col("doc_id") < 10), dir)
    }
    assert(e.getMessage.contains("already"))
    intercept[IllegalArgumentException] {
      Retrieval.appendToBm25Index(
        docs.where(col("doc_id") >= 100 && col("doc_id") < 110), dir,
        batchId = Some(-5L))
    }
  }

  test("appendToBm25Index: committed-id replay rewrites postings only; results stable") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val dir = java.nio.file.Files.createTempDirectory("bm25replay").toString
    Retrieval.buildBm25Index(docs.where(col("doc_id") < 300), dir)
    val batch = docs.where(col("doc_id") >= 300)
    Retrieval.appendToBm25Index(batch, dir, batchId = Some(0L))
    val before = Retrieval.bm25IndexedTopK(spark, dir, Seq("spark", "merge"), 20)
      .as[(Long, Double)].collect().toSeq
    // at-least-once redelivery of the same batch id: df/stats untouched
    Retrieval.appendToBm25Index(batch, dir, batchId = Some(0L))
    val after = Retrieval.bm25IndexedTopK(spark, dir, Seq("spark", "merge"), 20)
      .as[(Long, Double)].collect().toSeq
    assert(after == before)
    val vs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v")).map(_.getName).sorted
    assert(vs.toSeq == Seq("v0", "v1"), s"replay must not roll a version: ${vs.toSeq}")
    // a committed id resubmitted with DIFFERENT docs is not a replay —
    // it would desynchronize postings from the committed df/stats, so
    // the guard must refuse before touching the partition (ADVICE r12)
    val preTop = Retrieval.bm25IndexedTopK(spark, dir, Seq("spark", "merge"), 20)
      .as[(Long, Double)].collect().toSeq
    val err = intercept[IllegalArgumentException] {
      Retrieval.appendToBm25Index(
        docs.where(col("doc_id") >= 300 && col("doc_id") < 350)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")),
        dir, batchId = Some(0L))
    }
    assert(err.getMessage.contains("different doc set"))
    assert(Retrieval.bm25IndexedTopK(spark, dir, Seq("spark", "merge"), 20)
      .as[(Long, Double)].collect().toSeq == preTop,
      "a refused fake replay must leave the index untouched")
  }

  test("bm25 index crash discipline: uncommitted postings stay invisible") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val dir = java.nio.file.Files.createTempDirectory("bm25crash").toString
    Retrieval.buildBm25Index(docs.where(col("doc_id") < 250), dir)
    val before = Retrieval.bm25IndexedTopK(spark, dir, Seq("spark", "window"), 20)
      .as[(Long, Double)].collect().toSeq
    // simulate a crash mid-append: the batch's postings landed but no
    // version committed — the probe must not read the stray partition
    docs.where(col("doc_id") >= 250)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("dl", lit(7L))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
      .write.parquet(s"$dir/postings/batch=-2")
    val after = Retrieval.bm25IndexedTopK(spark, dir, Seq("spark", "window"), 20)
      .as[(Long, Double)].collect().toSeq
    assert(after == before, "stray uncommitted postings must be invisible")
  }

  test("rrfFuse: fused score is sum of reciprocal ranks; missing side contributes 0") {
    val a = Seq((10L, 0.9), (11L, 0.8), (12L, 0.7)).toDF("id", "s")
    val b = Seq((11L, 0.99), (13L, 0.5)).toDF("id", "s")
    val got = Retrieval.rrfFuse(
        Seq((a, Seq(col("s").desc, col("id"))), (b, Seq(col("s").desc, col("id")))),
        idCol = "id", k = 10)
      .as[(Long, Double, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 11 is rank 2 in a, rank 1 in b
    assert(got(11L) == (11L, r6(1.0 / 62 + 1.0 / 61), Some(2L), Some(1L)))
    // 10 only in a at rank 1; 13 only in b at rank 2
    assert(got(10L) == (10L, r6(1.0 / 61), Some(1L), None))
    assert(got(13L) == (13L, r6(1.0 / 62), None, Some(2L)))
    // consensus beats either single-list winner
    assert(got(11L)._2 > got(10L)._2 && got(11L)._2 > got(13L)._2)
  }

  test("bm25Join: per-query results equal the single-query operator") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val queries = Seq(
      (0L, Seq("spark", "merge")),
      (1L, Seq("window", "stream"))).toDF("query_id", "terms")
    val joined = Retrieval.bm25Join(docs, queries, k = 5)
      .select("query_id", "doc_id", "score").as[(Long, Long, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    for ((qid, terms) <- Seq(0L -> Seq("spark", "merge"), 1L -> Seq("window", "stream"))) {
      val single = Retrieval.bm25TopK(docs, terms, 5)
        .as[(Long, Double)].collect().toSet
      assert(joined(qid) == single, s"query $qid: ${joined(qid)} vs $single")
    }
    // rk is dense 1..k per query
    val rks = Retrieval.bm25Join(docs, queries, k = 5)
      .groupBy("query_id").agg(collect_list("rk"))
      .as[(Long, Seq[Long])].collect()
    assert(rks.forall(_._2.sorted == Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("hybrid fusion after growth: grown-index hybrid == rebuilt-index hybrid") {
    // Both standing indexes built on a half, grown by append, then FUSED —
    // the serving continuity guarantee: fusion over grown indexes equals
    // fusion over one-shot rebuilds (ranks are integers over total
    // orders, so equality is exact, not approximate).
    val docs = Tables(spark, sf(), "documents").select(col("doc_id"), col("text"))
    val embs = Tables(spark, sf(), "embeddings")
    val nD = docs.count()
    val nE = embs.count()
    val q = embs.where(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .head().getSeq[Double](0)
    val root = java.nio.file.Files.createTempDirectory("graft-hybrid-grown").toString
    Retrieval.buildBm25Index(docs.where(col("doc_id") < nD / 2), s"$root/bmG")
    Retrieval.appendToBm25Index(docs.where(col("doc_id") >= nD / 2), s"$root/bmG")
    Retrieval.buildBm25Index(docs, s"$root/bmF")
    Similarity.buildIvfPqIndex(embs.where(col("vec_id") < nE / 2), s"$root/annG")
    Similarity.appendToIvfPqIndex(embs.where(col("vec_id") >= nE / 2), s"$root/annG")
    Similarity.buildIvfPqIndex(embs, s"$root/annF")
    def fused(bmDir: String, annDir: String) = Retrieval.rrfFuse(Seq(
        (Retrieval.bm25IndexedTopK(spark, bmDir, Seq("spark", "window", "merge"), 20),
          Seq(col("score").desc, col("doc_id"))),
        (Similarity.ivfPqTopK(embs, annDir, q, 20).withColumnRenamed("vec_id", "doc_id"),
          Seq(col("sim").desc, col("doc_id")))),
      idCol = "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fused(s"$root/bmG", s"$root/annG") == fused(s"$root/bmF", s"$root/annF"),
      "fused ranking must be identical over grown and rebuilt indexes")
  }

  test("hybrid rrf over the real corpus: deterministic and consensus-ranked") {
    val e = Tables(spark, sf("sf0.01"), "embeddings")
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val q = e.where(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .head().getSeq[Double](0)
    def run() = Retrieval.rrfFuse(Seq(
        (Retrieval.bm25TopK(docs, Seq("spark", "window", "merge"), 50),
          Seq(col("score").desc, col("doc_id"))),
        (Similarity.bruteForceTopK(e, q, 50).withColumnRenamed("vec_id", "doc_id"),
          Seq(col("sim").desc, col("doc_id")))),
      idCol = "doc_id", k = 10).collect().toSeq
    val one = run()
    assert(one == run(), "fusion must be run-to-run deterministic")
    assert(one.size == 10)
    // any doc present in BOTH lists must outrank a doc present in one
    // list at the same single-list rank (1/(c+r) + something > 1/(c+r))
    val both = one.filter(r => !r.isNullAt(2) && !r.isNullAt(3))
    assert(both.nonEmpty, "the two rankings should overlap on this corpus")
  }
}
