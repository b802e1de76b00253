package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends TestBase {

  import spark.implicits._

  test("noveltyFunnel: gate drops junk, novelty floor drops corpus content, new text survives") {
    val standing = Seq(
      (100L, "the data table of rows and the columns of it all day long " +
        "while the fast stream and the slow batch of big data move along"))
      .toDF("doc_id", "text")
    val copiedCore = "the data table of rows and the columns of it all day long"
    val batch = Seq(
      // exact copy of standing content → novelty 0 → drops at the floor
      (1L, "aa", standing.head().getString(1)),
      // wrapper spam around a copied passage → mid novelty → drops at 0.5
      (2L, "aa", "x " + copiedCore + " y"),
      // genuinely new text (same vocab, different composition) → survives
      (3L, "aa", "a slow window of the sorted group and a query of the " +
        "big merge and the joined line of a filter of the new value here"),
      (4L, "bb", "the hash of a key and the sorted order of the parts " +
        "and a scan of the stream with the small vector of a batch too"),
      // junk: fails the LR gate before novelty is even computed
      (5L, "cc", "zz")
    ).toDF("doc_id", "lang", "text")
    val got = Curation.noveltyFunnel(standing, batch)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!got.contains("cc"), s"junk-only lang must not appear: $got")
    assert(got("aa")._1 == 3L && got("aa")._2 == 1L,
      s"aa: 3 gated, only the new doc novel: $got")
    assert(got("bb")._1 == 1L && got("bb")._2 == 1L, s"bb survives whole: $got")
    // balanced 1/1 mixture: temperature thresholds keep both strata whole
    assert(got("aa")._3 <= got("aa")._2 && got("bb")._3 <= got("bb")._2)
  }

  test("funnel: gate drops junk, semantic stage drops copies, smallest lang kept whole") {
    // lang "aa": 3 good docs, one an exact copy (text+vector) of another;
    // lang "bb": 1 good doc; lang "cc": 1 junk doc (fails the LR gate:
    // single short token, no stopwords).
    val docs = Seq(
      (1L, "aa", "the data table of rows and the columns of it"),
      (2L, "aa", "the data table of rows and the columns of it"), // copy of 1
      (3L, "aa", "a fast stream and a slow batch of the big data"),
      (4L, "bb", "the group and the window of a query of the rows"),
      (5L, "cc", "zz")
    ).toDF("doc_id", "lang", "text")
    val vec = Map(
      1L -> Array(1.0f, 0.0f), 2L -> Array(1.0f, 0.0f),
      3L -> Array(0.0f, 1.0f), 4L -> Array(0.6f, 0.8f), 5L -> Array(0.1f, 0.9f))
    val embs = vec.toSeq.toDF("vec_id", "embedding")
    val got = Curation.funnel(docs, embs, threshold = 0.95, nCells = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // cc fails the gate entirely → absent from the funnel
    assert(!got.contains("cc"), s"junk-only lang must not appear: $got")
    // aa: 3 gated, copy 2 drops in the semantic stage → 2; bb: 1 → 1
    assert(got("aa")._1 == 3L && got("aa")._2 == 2L, s"got $got")
    assert(got("bb") == ((1L, 1L, 1L)), s"got $got")
    // temperature keeps the smallest lang whole and n_final <= n_semantic
    assert(got("aa")._3 <= got("aa")._2)
  }

  test("drift: identical distributions score PSI 0; a shifted bin matches hand arithmetic") {
    def corpus(bins: String*) =
      bins.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("doc_id", "b")
    // identical standing/batch distributions → every (p − q) term is 0
    val same = corpus("A", "A", "B", "B")
    val zero = Curation.drift(same, same, Seq("b" -> col("b"))).collect()(0)
    assert(zero.getAs[Long]("n_bins") == 2L && zero.getAs[Double]("psi") == 0.0)
    // standing = {A:4, B:4}, batch = {A:8, B:0}; union bins nb = 2, add-one
    // smoothing: q_A = q_B = 5/10, p_A = 9/10, p_B = 1/10.
    //   A: (0.9-0.5)·ln(0.9/0.5) → round(235114.66…) = 235115 (×10⁻⁶)
    //   B: (0.1-0.5)·ln(0.1/0.5) → round(643775.16…) = 643775
    val got = Curation.drift(
      corpus("A", "A", "A", "A", "B", "B", "B", "B"),
      corpus("A", "A", "A", "A", "A", "A", "A", "A"),
      Seq("b" -> col("b"))).collect()(0)
    assert(got.getAs[Long]("n_bins") == 2L)
    assert(got.getAs[Double]("psi") == 0.87889, s"got $got")
    // duplicate feature names would silently double-count bins — refused
    val err = intercept[IllegalArgumentException] {
      Curation.drift(same, same, Seq("b" -> col("b"), "b" -> upper(col("b"))))
    }
    assert(err.getMessage.contains("duplicate drift feature"), err.getMessage)
  }

  test("driftGate: planted drift lands in the declared bands; overrides and guards") {
    def corpus(bins: String*) =
      bins.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("doc_id", "b")
    val same = corpus("A", "A", "B", "B")
    val shifted = corpus("A", "A", "A", "A", "A", "A", "A", "A")
    // identical corpora → stable on every feature (the planted-fixture
    // contract from the r14 verdict)
    val st = Curation.driftGate(Curation.drift(same, same, Seq("b" -> col("b"))))
      .collect()(0)
    assert(st.getAs[String]("band") == "stable", st.toString)
    // the hand-computed 0.87889 shift from the drift spec → 'shifted'
    val sh = Curation.driftGate(Curation.drift(same, shifted, Seq("b" -> col("b"))))
      .collect()(0)
    assert(sh.getAs[String]("band") == "shifted", sh.toString)
    // a per-feature override reclassifies exactly that feature
    val ov = Curation.driftGate(
        Curation.drift(same, shifted, Seq("b" -> col("b"))),
        thresholds = Map("b" -> (0.5, 5.0)))
      .collect()(0)
    assert(ov.getAs[String]("band") == "drifting", ov.toString)
    // malformed thresholds fail loudly
    intercept[IllegalArgumentException] {
      Curation.driftGate(Curation.drift(same, same, Seq("b" -> col("b"))),
        warn = 0.3, shift = 0.2)
    }
    intercept[IllegalArgumentException] {
      Curation.driftGate(Curation.drift(same, same, Seq("b" -> col("b"))),
        thresholds = Map("b" -> (0.5, 0.1)))
    }
  }

  test("purgeFromDriftIndex: subtracted == recounted-without; over-claim fails and rolls back") {
    def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "b")
    val f = Seq("b" -> col("b"))
    val standing = corpus(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B", 5L -> "C")
    val batch = corpus(10L -> "A", 11L -> "B", 12L -> "C")
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-purge").toString
    Curation.buildDriftIndex(standing, f, s"$dir/i")
    // purge doc 2 (an A) and doc 5 (the only C — its bin must VANISH,
    // not linger as a phantom zero bin)
    Curation.purgeFromDriftIndex(corpus(2L -> "A", 5L -> "C"), f, s"$dir/i", 0L)
    val got = Curation.driftAgainstIndex(s"$dir/i", batch, f).collect()(0)
    val want = Curation.drift(
      corpus(1L -> "A", 3L -> "B", 4L -> "B"), batch, f).collect()(0)
    assert(got.getAs[Long]("n_bins") == want.getAs[Long]("n_bins") &&
      got.getAs[Double]("psi") == want.getAs[Double]("psi"),
      s"got $got want $want")
    // over-claiming (rows never counted in) fails loudly AND removes its
    // delta — the index must stay exactly as before the bad purge
    val before = Curation.driftAgainstIndex(s"$dir/i", batch, f).collect()(0)
    val err = intercept[IllegalArgumentException] {
      Curation.purgeFromDriftIndex(
        corpus(90L -> "C", 91L -> "C"), f, s"$dir/i", 1L)
    }
    assert(err.getMessage.contains("negative"), err.getMessage)
    val after = Curation.driftAgainstIndex(s"$dir/i", batch, f).collect()(0)
    assert(before == after, "a refused purge must leave the index unchanged")
  }

  test("drift index format marker: markerless or mismatched layouts refused on every read path") {
    // r16 ADVICE: the V/N bin rendering IS the persisted index format —
    // an index stored under a different rendering never joins a probe's
    // bins, so every bin splits into one-sided phantoms and PSI silently
    // inflates. Old layouts must fail loudly instead.
    def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "b")
    val f = Seq("b" -> col("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-fmt").toString
    Curation.buildDriftIndex(corpus(1L -> "A", 2L -> "B"), f, s"$dir/i")
    // fresh build probes fine (marker present)
    Curation.driftAgainstIndex(s"$dir/i", corpus(3L -> "A"), f).collect()
    val marker = java.nio.file.Paths.get(s"$dir/i", "_GRAFT_DRIFT_FORMAT")
    // tampering via java.nio bypasses Hadoop's ChecksumFileSystem — drop
    // the .crc sidecar too or the reads fail on checksum, not content
    val crc = java.nio.file.Paths.get(s"$dir/i", "._GRAFT_DRIFT_FORMAT.crc")
    java.nio.file.Files.delete(marker)
    java.nio.file.Files.deleteIfExists(crc)
    val e1 = intercept[IllegalArgumentException] {
      Curation.driftAgainstIndex(s"$dir/i", corpus(3L -> "A"), f)
    }
    assert(e1.getMessage.contains("rebuild"), e1.getMessage)
    intercept[IllegalArgumentException] {
      Curation.appendToDriftIndex(corpus(4L -> "B"), f, s"$dir/i", 0L)
    }
    intercept[IllegalArgumentException] {
      Curation.purgeFromDriftIndex(corpus(1L -> "A"), f, s"$dir/i", 0L)
    }
    // a mismatched version number is refused the same way
    java.nio.file.Files.write(marker, "1\n".getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(crc)
    val e2 = intercept[IllegalArgumentException] {
      Curation.driftAgainstIndex(s"$dir/i", corpus(3L -> "A"), f)
    }
    assert(e2.getMessage.contains("layout v1"), e2.getMessage)
  }

  test("drift: a nullable feature forms ONE aligned null bin, not two phantom bins") {
    // r14 ADVICE (medium): null join keys never match in the full-outer
    // bin alignment, so a null bin present on BOTH sides used to split
    // into two one-sided bins — inflating n_bins and reporting drift on a
    // non-drifting distribution. The injective N/V bin rendering aligns it.
    def corpus(bins: Option[String]*) =
      bins.zipWithIndex.map { case (b, i) => (i.toLong, b.orNull) }.toDF("doc_id", "b")
    val same = corpus(Some("A"), Some("A"), None, None)
    val zero = Curation.drift(same, same, Seq("b" -> col("b"))).collect()(0)
    assert(zero.getAs[Long]("n_bins") == 2L,
      s"null must be one bin, not two phantom one-sided bins: $zero")
    assert(zero.getAs[Double]("psi") == 0.0, s"identical sides must not drift: $zero")
    // and null stays a DISTINCT bin from any real value (injective): a
    // batch that replaces nulls with 'A' genuinely drifts
    val shifted = Curation.drift(same,
      corpus(Some("A"), Some("A"), Some("A"), Some("A")),
      Seq("b" -> col("b"))).collect()(0)
    assert(shifted.getAs[Long]("n_bins") == 2L && shifted.getAs[Double]("psi") > 0.0,
      s"null->A replacement must register as drift: $shifted")
  }
}
