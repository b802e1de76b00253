package graft

import graft.operators.{Dedup, MediaRow, Multimodal}
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
}
