package graft

import graft.operators.{Dedup, MediaRow, Multimodal}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Property-based cross-checks against independent reference
  * implementations — the first use of the declared scalacheck dep. Spark
  * jobs per case are kept cheap (toy inputs, few cases, fixed seed so a
  * failure reproduces); pure-function properties run at full case counts.
  */
class PropertySpec extends TestBase {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(Seed(42L)), p)
    assert(res.passed, res.status.toString)
  }

  test("media sniffers never crash and imply their magic bytes (fuzz)") {
    val bytesGen = Gen.containerOf[Array, Byte](
      Gen.choose(Byte.MinValue, Byte.MaxValue))
    check(Prop.forAll(bytesGen) { bytes =>
      val img = Multimodal.sniffImageFormat(bytes)
      val wav = Multimodal.sniffWav(bytes)
      val avi = Multimodal.sniffAvi(bytes)
      // a positive sniff implies the magic actually present
      (img != Some("png") || ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P')) &&
      (img != Some("bmp") || (bytes(0) == 'B' && bytes(1) == 'M')) &&
      (img != Some("gif") || bytes.startsWith("GIF8".getBytes)) &&
      (img != Some("jpeg") || ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)) &&
      (!wav || (bytes.length >= 12 && bytes.startsWith("RIFF".getBytes))) &&
      (!avi || (bytes.length >= 12 && bytes.startsWith("RIFF".getBytes)))
    }, 200)
  }

  test("AVI walker survives arbitrary corruption of a valid container (fuzz)") {
    // One Spark job over many mutants, not one job per case: flip a byte,
    // truncate, or splice garbage into a valid fixture — the kernel must
    // emit a row ("avi" or "raw") for every mutant, never throw.
    val base = Multimodal.syntheticAvi(Seq(7L).toDF("doc_id")).collect().head.content
    val rnd = new scala.util.Random(42)
    val mutants = (0 until 60).map { i =>
      val b = base.clone()
      rnd.nextInt(3) match {
        case 0 => // flip a byte (headers included)
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte; b
        case 1 => b.take(rnd.nextInt(b.length)) // truncate anywhere
        case 2 => // corrupt a chunk-size field region
          val off = rnd.nextInt(math.max(1, b.length - 4))
          (0 until 4).foreach(j => if (off + j < b.length) b(off + j) = 0xff.toByte)
          b
      }
    }
    val rows = Multimodal.parseVideoMeta(
      mutants.zipWithIndex.map { case (m, i) => MediaRow(i.toLong, "x", m) }.toDS())
      .collect()
    assert(rows.length == mutants.length)
    assert(rows.forall(v => v.format == "avi" || v.format == "raw"))
  }

  test("connected components match a reference union-find on random graphs") {
    def refUnionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
          parent(hi) = lo }
      }
      val nodes = edges.flatMap(e => List(e._1, e._2)).distinct
      nodes.map(n => n -> find(n)).toMap
    }
    val genEdges = for {
      n <- Gen.choose(2, 25)
      m <- Gen.choose(1, 35)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield edges.filter(e => e._1 != e._2)
    check(Prop.forAll(genEdges) { edges =>
      edges.isEmpty || {
        val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        got == refUnionFind(edges)
      }
    }, 8)
  }

  test("purgeFromClusters equals from-scratch CC over pairs-minus-incident on random graphs") {
    // the takedown's trickiest operator: removing a doc can SPLIT its
    // component (cut vertex), shrink it, or erase it — for ANY random
    // graph and ANY purge set, the touched-component re-solve must equal
    // a full CC over the filtered edge set
    val genCase = for {
      n <- Gen.choose(2, 20)
      m <- Gen.choose(1, 30)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
      k <- Gen.choose(0, 5)
      purge <- Gen.listOfN(k, Gen.choose(0L, n.toLong))
    } yield (edges.filter(e => e._1 != e._2), purge.distinct)
    check(Prop.forAll(genCase) { case (edges, purge) =>
      edges.isEmpty || {
        val pairs = edges.toDF("doc_a", "doc_b")
        val labels = Dedup.connectedComponents(pairs)
        val got = graft.operators.Purge
          .purgeFromClusters(labels, pairs, purge.toDF("doc_id"))
          .as[(Long, Long)].collect().toMap
        val kept = edges.filterNot(e =>
          purge.contains(e._1) || purge.contains(e._2))
        val want =
          if (kept.isEmpty) Map.empty[Long, Long]
          else Dedup.connectedComponents(kept.toDF("doc_a", "doc_b"))
            .as[(Long, Long)].collect().toMap
        got == want
      }
    }, 10)
  }

  test("drift PSI is symmetric, non-negative, and zero on identical corpora (random bins)") {
    import graft.operators.Curation
    // per-bin term (p − q)·ln(p/q) ≥ 0, and swapping sides maps it to
    // (q − p)·ln(q/p) — the same value — so PSI must be symmetric and
    // non-negative for ANY pair of bin multisets; identical multisets
    // must read exactly 0.0 (every term's quantization is round(0) = 0).
    val genSide = for {
      n <- Gen.choose(1, 40)
      bins <- Gen.listOfN(n, Gen.choose(0, 5))
    } yield bins
    check(Prop.forAll(genSide, genSide) { (as, bs) =>
      def df(xs: List[Int]) = xs.zipWithIndex
        .map { case (b, i) => (i.toLong, s"b$b") }.toDF("doc_id", "b")
      val f = Seq("b" -> col("b"))
      def psi(x: List[Int], y: List[Int]): Double =
        Curation.drift(df(x), df(y), f).collect()(0).getAs[Double]("psi")
      val ab = psi(as, bs)
      ab >= 0.0 && ab == psi(bs, as) && psi(as, as) == 0.0
    }, 8)
  }

  test("exactNearDupTruth (prefix-filtered) equals brute-force Jaccard truth on random corpora") {
    // the prefix filter must be COMPLETE: same pair set as scoring every
    // pair of docs exhaustively, for any threshold and any shingle overlap
    def bruteTruth(docs: List[(Long, String)], t: Double): Set[(Long, Long)] = {
      def sh(s: String): Set[String] = {
        val w = s.split(" ").toList
        if (w.length < 3) Set(s)
        else w.sliding(3).map(_.mkString(" ")).toSet
      }
      val sets = docs.map { case (id, s) => id -> sh(s) }
      // threshold on the UNROUNDED ratio — the r15 contract (round only
      // the emitted jaccard column), mirroring Dedup.exactNearDupTruth
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= t
      } yield (a, b)).toSet
    }
    val words = Vector("a", "b", "c", "d", "e", "f")
    val genCorpus = for {
      nd <- Gen.choose(2, 10)
      docs <- Gen.listOfN(nd, for {
        len <- Gen.choose(1, 10)
        ws <- Gen.listOfN(len, Gen.oneOf(words))
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val genT = Gen.oneOf(0.3, 0.5, 0.8)
    check(Prop.forAll(genCorpus, genT) { (docs, t) =>
      val got = graft.operators.Dedup
        .exactNearDupTruth(docs.toDF("doc_id", "text"), t)
        .select(col("doc_a"), col("doc_b"))
        .as[(Long, Long)].collect().toSet
      got == bruteTruth(docs, t)
    }, 10)
  }

  test("exact dedup keeps min doc_id and true copy counts on random corpora") {
    val genDocs = for {
      n <- Gen.choose(1, 40)
      docs <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 1000L); t <- Gen.oneOf("a", "b", "c", "d e", "f g h", "")
      } yield (id, t))
    } yield docs.distinctBy(_._1) // doc ids unique by contract
    check(Prop.forAll(genDocs) { docs =>
      docs.isEmpty || {
        val expected = docs.groupBy(_._2).map { case (t, ds) =>
          t -> ((ds.map(_._1).min, ds.length.toLong))
        }
        val got = Dedup.exact(docs.toDF("doc_id", "text"))
          .as[(String, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        // compare through md5 since exact() keys by hash
        val md = java.security.MessageDigest.getInstance("MD5")
        val expByHash = expected.map { case (t, v) =>
          md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString -> v
        }
        got == expByHash
      }
    }, 10)
  }

  test("semanticDedup matches a reference greedy keep-first on random vector sets") {
    // Reference replays the EXACT engine arithmetic: left-to-right dots,
    // argmax (cosine DESC, cell ASC), greedy "exists smaller-id cell-mate
    // at >= tau". Integer-valued components keep every dot/norm exact, so
    // reference and engine compute identical doubles.
    def sdot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      sdot(a, b) / (math.sqrt(sdot(a, a)) * math.sqrt(sdot(b, b)))
    val genVecs = for {
      n <- Gen.choose(1, 25)
      vs <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 500L)
        v <- Gen.listOfN(3, Gen.choose(-3, 3).map(_.toDouble))
      } yield (id, v.toArray))
    } yield vs.distinctBy(_._1).filter(x => sdot(x._2, x._2) > 0)
    check(Prop.forAll(genVecs) { vs =>
      vs.isEmpty || {
        val nCells = 2
        val cents = vs.sortBy(_._1).take(nCells)
        def cellOf(v: Array[Double]): Long =
          cents.map { case (cid, cv) => (cos(v, cv), cid) }
            .reduceLeft { (a, b) =>
              val c = java.lang.Double.compare(a._1, b._1)
              if (c > 0 || (c == 0 && a._2 < b._2)) a else b
            }._2
        val byCell = vs.map { case (id, v) => (id, v, cellOf(v)) }
        val expected = byCell.map { case (id, v, cell) =>
          val dropped = byCell.exists { case (id2, v2, cell2) =>
            cell2 == cell && id2 < id && cos(v2, v) >= 0.9 }
          id -> ((cell, if (dropped) 0 else 1))
        }.toMap
        val got = graft.operators.Similarity.semanticDedup(
            vs.map { case (id, v) => (id, v.map(_.toFloat)) }
              .toDF("vec_id", "embedding"), 0.9, nCells = nCells)
          .as[(Long, Long, Int)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        got == expected
      }
    }, 10)
  }

  test("snapshot diff matches a per-key reference fold on random event logs") {
    import graft.operators.SnapshotDiff
    val genLog = for {
      n <- Gen.choose(1, 60)
      evs <- Gen.listOfN(n, for {
        key <- Gen.choose(0L, 8L)
        tsSec <- Gen.choose(0L, 100L)
        tp <- Gen.oneOf("click", "view", "gone")
        v <- Gen.choose(0, 5).map(_.toDouble)
      } yield (key, tsSec, tp, v))
    } yield evs.zipWithIndex.map { case ((k, t, tp, v), i) => (i.toLong, k, t, tp, v) }
    val (t0Sec, t1Sec) = (40L, 90L)
    check(Prop.forAll(genLog) { evs =>
      def stateAt(key: Long, bound: Long): Option[(String, Double)] =
        evs.filter(e => e._2 == key && e._3 < bound)
          .sortBy(e => (e._3, e._1)).lastOption
          .map(e => (e._4, e._5))
          .filterNot(_._1 == "gone")
      val keys = evs.map(_._2).distinct
      val expected = keys.flatMap { k =>
        (stateAt(k, t0Sec), stateAt(k, t1Sec)) match {
          case (None, None) => None
          case (None, Some(n)) => Some(k -> (("insert", null: String, n._1)))
          case (Some(o), None) => Some(k -> (("delete", o._1, null: String)))
          case (Some(o), Some(n)) =>
            Some(k -> ((if (o != n) "update" else "unchanged", o._1, n._1)))
        }
      }.toMap
      val df = evs.toDF("event_id", "k", "ts_sec", "event_type", "value")
        .select(col("event_id"), expr("timestamp_seconds(ts_sec)").as("ts"),
          col("k"), col("event_type"), col("value"))
      val got = SnapshotDiff.diff(df, col("k"),
          lit(t0Sec * 1000000L), lit(t1Sec * 1000000L), tombstone = Some("gone"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
        .toMap
      got == expected
    }, 10)
  }

  test("exactSubstringSpans matches a reference mark-and-merge on random corpora") {
    // tiny alphabet forces cross-doc and within-doc window repeats
    val docGen = Gen.choose(4, 28).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.choose(2, 6).flatMap(k => Gen.listOfN(k, docGen))
    val L = 4
    def refSpans(docs: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
      val wins = for {
        (id, t) <- docs if t.length >= L
        p <- 1 to (t.length - L + 1)
      } yield (id, p.toLong, t.substring(p - 1, p - 1 + L))
      val byWin = wins.groupBy(_._3)
      val marked = wins.collect {
        case (id, p, w) if byWin(w).size > 1 &&
          byWin(w).map(x => (x._1, x._2)).min != ((id, p)) => (id, p)
      }
      marked.groupBy(_._1).flatMap { case (id, ps0) =>
        val ps = ps0.map(_._2).sorted
        val spans = scala.collection.mutable.ListBuffer[(Long, Long, Long)]()
        var start = ps.head
        var prev = ps.head
        for (p <- ps.tail) {
          if (p > prev + L) { spans += ((id, start, prev + L)); start = p }
          prev = p
        }
        spans += ((id, start, prev + L))
        spans
      }.toSet
    }
    check(Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.exactSubstringSpans(docs.toDF("doc_id", "text"), L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got == refSpans(docs)
    }, 12)
  }

  test("bm25 matches a reference scorer on random corpora and term sets") {
    import graft.operators.Retrieval
    val word = Gen.oneOf("red", "blue", "green", "dog", "cat", "fish", "sky")
    val docGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word))
    val corpusGen = Gen.choose(2, 6).flatMap(k => Gen.listOfN(k, docGen))
    val termsGen = Gen.choose(1, 3).flatMap(k =>
      Gen.listOfN(k, word)).map(_.distinct)
    def ref(docs: Seq[(Long, Seq[String])], terms: Seq[String])
        : Map[Long, Double] = {
      val n = docs.size.toDouble
      val avgdl = docs.map(_._2.size).sum / n
      val dfs = terms.map(t => t -> docs.count(_._2.contains(t))).toMap
      docs.flatMap { case (id, ws) =>
        val s = terms.map { t =>
          val tf = ws.count(_ == t).toDouble
          if (tf == 0) 0.0
          else math.log(1 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5)) *
            tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * ws.size / avgdl))
        }.sum
        if (s > 0 || terms.exists(ws.contains))
          Some(id -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
      }.toMap
    }
    check(Prop.forAll(corpusGen, termsGen) { (texts, terms) =>
      val docs = texts.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      val got = Retrieval.bm25(
          docs.map { case (i, ws) => (i, ws.mkString(" ")) }.toDF("doc_id", "text"),
          terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = ref(docs, terms)
      got.keySet == want.keySet &&
        got.forall { case (k, v) => math.abs(v - want(k)) <= 1e-6 }
    }, 12)
  }

  test("hilbert kernel: bijective and step-adjacent at every order (pure)") {
    // Pure-function property over the STATIC kernel the codegen calls —
    // full case counts, no Spark jobs. For random orders 1..5, the full
    // 2^b x 2^b grid maps bijectively onto [0, 4^b) and walking the curve
    // in d order moves exactly one grid step at a time (the locality
    // property the layout buys files with).
    check(Prop.forAll(Gen.choose(1, 5)) { bits =>
      val n = 1 << bits
      val cells = for (x <- 0 until n; y <- 0 until n)
        yield (x.toLong, y.toLong, graft.functions.HilbertValue.xy2d(x, y, bits))
      val ds = cells.map(_._3)
      val bijective = ds.sorted == (0L until (n.toLong * n)).toList
      val walk = cells.sortBy(_._3)
      val adjacent = walk.sliding(2).forall {
        case Seq((x1, y1, _), (x2, y2, _)) =>
          math.abs(x1 - x2) + math.abs(y1 - y2) == 1
        case _ => true
      }
      bijective && adjacent
    }, 50)
  }

  test("morton spread kernel: exact bit placement and round trip (pure)") {
    val gen = for {
      bits <- Gen.choose(1, 16)
      k <- Gen.choose(1, 3)
      v <- Gen.choose(0L, (1L << bits) - 1)
    } yield (v, bits, k)
    check(Prop.forAll(gen) { case (v, bits, k) =>
      val s = graft.functions.MortonValue.spread(v, bits, k)
      // every set bit b of v lands at b*k and nowhere else
      val placed = (0 until bits).forall { b =>
        ((s >> (b * k)) & 1L) == ((v >> b) & 1L)
      }
      // collecting the bits back recovers v (round trip)
      val back = (0 until bits).foldLeft(0L) { (acc, b) =>
        acc | (((s >> (b * k)) & 1L) << b)
      }
      placed && back == v && java.lang.Long.bitCount(s) == java.lang.Long.bitCount(v)
    }, 500)
  }
}
