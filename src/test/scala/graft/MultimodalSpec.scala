package graft

import graft.operators.{MediaRow, Multimodal}
import org.apache.spark.sql.functions.col

/** Real-codec coverage for the multimodal kernels: an independently-encoded
  * committed PNG fixture (hand-built encoder, not ImageIO — so the test
  * proves interop, not a self-round-trip), the deterministic synthetic
  * fixtures, and the nearest-neighbor resize chain. */
class MultimodalSpec extends TestBase {
  import spark.implicits._

  /** Expected pixel checksum of a synthetic image (`Multimodal
    * .syntheticImages` formula): sum over (x, y, c) of
    * (id·31 + x·7 + y·13 + c·5) mod 256. */
  private def expectedSum(id: Long): Long = {
    val w = (id % 13 + 3).toInt
    val h = (id % 7 + 2).toInt
    (for { y <- 0 until h; x <- 0 until w; c <- 0 until 3 }
      yield (id * 31 + x * 7 + y * 13 + c * 5) % 256).sum
  }

  test("decode reads a committed PNG fixture from a foreign encoder") {
    val in = getClass.getResourceAsStream("/fixture_3x2.png")
    assert(in != null, "missing committed fixture_3x2.png")
    val bytes = in.readAllBytes()
    in.close()
    val media = Seq(MediaRow(7L, "image/png", bytes)).toDS()
    val d = Multimodal.decode(media).collect().head
    assert(d.format == "png")
    assert(d.width == 3 && d.height == 2 && d.channels == 3)
    // row 0: (255,0,0),(0,255,0),(0,0,255); row 1: (10..90 by 10)
    assert(d.px_sum == 1215L)
    assert(d.n_frames == 1)
  }

  test("synthetic fixtures round-trip the real codec pixel-exactly (PNG and BMP)") {
    val ids = Seq(0L, 1L, 12L, 13L).toDF("doc_id")
    val got = Multimodal.decode(Multimodal.syntheticImages(ids))
      .collect().map(d => d.doc_id -> d).toMap
    for (id <- Seq(0L, 1L, 12L, 13L)) {
      val d = got(id)
      assert(d.format == (if (id % 2 == 0) "png" else "bmp"))
      assert(d.width == (id % 13 + 3).toInt && d.height == (id % 7 + 2).toInt)
      assert(d.channels == 3)
      assert(d.px_sum == expectedSum(id), s"px_sum mismatch for id $id")
    }
  }

  test("resize: nearest-neighbor source mapping, re-encoded output re-decodes") {
    // id 0: 3×2 source → 4×4 output; NN source pixel = (x·3/4, y·2/4).
    val out = Multimodal.resizeImages(
      Multimodal.syntheticImages(Seq(0L).toDF("doc_id")), 4, 4)
      .collect().head
    assert(out.getAs[Int]("out_w") == 4 && out.getAs[Int]("out_h") == 4)
    val expected = (for { y <- 0 until 4; x <- 0 until 4; c <- 0 until 3 }
      yield ((x * 3 / 4) * 7 + (y * 2 / 4) * 13 + c * 5) % 256).sum.toLong
    assert(out.getAs[Long]("px_sum") == expected)
  }

  test("decode handles GIF (palette round-trip) and JPEG (lossy: dims only)") {
    def encoded(fmt: String): Array[Byte] = {
      // 4×2, two flat colors with DIFFERENT channel sums (red 255 vs gray
      // 384) — an earlier red/blue fixture had equal sums and masked the
      // JDK writer's small-height interlace corruption (see
      // syntheticAnimatedGifs); written non-interlaced so the bytes are
      // pixel-exact. JPEG is lossy by design (dims asserted).
      val img = new java.awt.image.BufferedImage(
        4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for { y <- 0 until 2; x <- 0 until 4 }
        img.setRGB(x, y, if ((x + y) % 2 == 0) 0xff0000 else 0x808080)
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName(fmt).next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        val param = writer.getDefaultWriteParam
        if (param.canWriteProgressive)
          param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
    val media = Seq(
      MediaRow(1L, "image/gif", encoded("gif")),
      MediaRow(2L, "image/jpeg", encoded("jpg"))).toDS()
    val got = Multimodal.decode(media).collect().map(d => d.doc_id -> d).toMap
    assert(got(1L).format == "gif" && got(2L).format == "jpeg")
    assert(got(1L).width == 4 && got(1L).height == 2)
    assert(got(2L).width == 4 && got(2L).height == 2)
    // Palette GIF: the raster has ONE band (palette indices) but the pixels
    // are full RGB — channels must report the ColorModel's component count,
    // not the band count, or channels==3 filters drop every GIF.
    assert(got(1L).channels == 3,
      s"indexed GIF must report 3 RGB channels, got ${got(1L).channels}")
    assert(got(2L).channels == 3)
    // 4 red (sum 255) + 4 gray (sum 384) — sums differ per color, so a
    // row-replicating corruption cannot cancel out
    assert(got(1L).px_sum == 4 * 255L + 4 * 384L)
    assert(got(2L).px_sum > 0L) // JPEG decodes; exact pixels are codec-defined
  }

  test("malformed claimed-image bytes fall back to raw instead of crashing") {
    // The JDK BMP reader claims any stream starting "BM" and then throws
    // parsing the fake header — a text document beginning "BMW" must take
    // the raw branch, and resize must drop it, not kill the task.
    val bogus = "BMW makes cars not bitmaps, definitely not bitmaps".getBytes("UTF-8")
    val media = Seq(MediaRow(9L, "text/plain", bogus)).toDS()
    val d = Multimodal.decode(media).collect().head
    assert(d.format == "raw" && d.channels == 0 && d.px_sum == -1L)
    assert(Multimodal.resizeImages(media).isEmpty)
  }

  test("animated GIF reports its real container frame count") {
    val frame = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    writer.writeToSequence(new javax.imageio.IIOImage(frame, null, null), null)
    writer.writeToSequence(new javax.imageio.IIOImage(frame, null, null), null)
    writer.writeToSequence(new javax.imageio.IIOImage(frame, null, null), null)
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    val d = Multimodal.decode(
      Seq(MediaRow(5L, "image/gif", bos.toByteArray)).toDS()).collect().head
    assert(d.format == "gif" && d.n_frames == 3)
    assert(d.width == 2 && d.height == 2)
  }

  test("animated-GIF frame sampling decodes every strided frame pixel-exactly") {
    val ids = Seq(0L, 1L, 4L).toDF("doc_id") // 2, 3, 6 frames
    val got = Multimodal.sampleFramesReal(
      Multimodal.syntheticAnimatedGifs(ids), 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    val expectedKeys = for {
      id <- Seq(0L, 1L, 4L); f <- 0 until (id % 5 + 2).toInt by 2
    } yield (id, f)
    assert(got.keySet == expectedKeys.toSet)
    for (((id, f), (w, h, sum)) <- got) {
      assert(w == 4 && h == 3)
      val expected = (for { y <- 0 until 3; x <- 0 until 4; c <- 0 until 3 }
        yield (id * 31 + f * 17 + x * 7 + y * 13 + c * 5) % 256).sum
      assert(sum == expected, s"px_sum mismatch for id $id frame $f")
    }
    // non-image payloads drop, stride 1 samples every frame
    assert(Multimodal.sampleFramesReal(
      Seq(MediaRow(9L, "text/plain", "not an image".getBytes)).toDS()).isEmpty)
    assert(Multimodal.sampleFramesReal(
      Multimodal.syntheticAnimatedGifs(Seq(4L).toDF("doc_id")), 1).count() == 6)
  }

  test("synthetic audio round-trips the real WAV codec sample-exactly") {
    val ids = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val got = Multimodal.decodeAudio(Multimodal.syntheticAudio(ids))
      .collect().map(d => d.doc_id -> d).toMap
    for (id <- Seq(0L, 1L, 2L, 3L)) {
      val d = got(id)
      val ch = (id % 2 + 1).toInt
      val frames = (id % 50 + 10).toInt
      assert(d.format == "wav")
      assert(d.sample_rate == (8000 * (id % 3 + 1)).toInt)
      assert(d.channels == ch && d.bits == 16)
      assert(d.n_samples == frames.toLong)
      val expected = (for { i <- 0 until frames; c <- 0 until ch }
        yield ((id * 31 + i * 7 + c * 13) % 65536) - 32768).sum
      assert(d.sample_sum == expected, s"sample_sum mismatch for id $id")
    }
  }

  test("non-audio and malformed RIFF payloads take the raw audio branch") {
    // "RIFF....WAVE" prefix with a garbage body: AudioSystem claims then
    // throws — must fall back, not crash the task (decode's contract).
    val bogus = ("RIFF" + " " * 4 + "WAVEgarbage body here").getBytes("ISO-8859-1")
    val media = Seq(
      MediaRow(1L, "text/plain", "just some text".getBytes("UTF-8")),
      MediaRow(2L, "audio/wav", bogus)).toDS()
    val got = Multimodal.decodeAudio(media).collect().map(d => d.doc_id -> d).toMap
    for (id <- Seq(1L, 2L)) {
      val d = got(id)
      assert(d.format == "raw" && d.channels == 0 && d.sample_sum == -1L)
      assert(d.n_samples == d.byte_len % 48000)
    }
  }

  test("AVI container walk: counted frames, header fields, payload checksum") {
    val ids = Seq(0L, 1L, 5L).toDF("doc_id")
    val got = Multimodal.parseVideoMeta(Multimodal.syntheticAvi(ids))
      .collect().map(v => v.doc_id -> v).toMap
    for (id <- Seq(0L, 1L, 5L)) {
      val v = got(id)
      val w = (16 + id % 8).toInt; val h = (8 + id % 4).toInt
      val nf = (id % 6 + 2).toInt
      assert(v.format == "avi")
      assert(v.width == w && v.height == h)
      assert(v.n_frames == nf.toLong, s"frame count for id $id")
      assert(v.usec_per_frame == 33333L + (id % 5) * 1000L)
      assert(v.frame_bytes == nf.toLong * w * h)
      val expected = (for { f <- 0 until nf; j <- 0 until w * h }
        yield (id * 7 + f * 11 + j * 3) % 256).sum
      assert(v.frame_sum == expected, s"frame_sum mismatch for id $id")
    }
  }

  test("non-AVI and truncated-RIFF payloads take the raw video branch") {
    val truncated = Multimodal.syntheticAvi(Seq(3L).toDF("doc_id"))
      .collect().head.content.take(40) // cuts mid-hdrl: sizes now lie
    val media = Seq(
      MediaRow(1L, "text/plain", "RIFFxxxxWAVE not a video".getBytes("ISO-8859-1")),
      MediaRow(2L, "video/x-msvideo", truncated),
      MediaRow(3L, "text/plain", "plain".getBytes)).toDS()
    val got = Multimodal.parseVideoMeta(media).collect().map(v => v.doc_id -> v).toMap
    for (id <- Seq(1L, 2L, 3L))
      assert(got(id).format == "raw" && got(id).n_frames == -1L,
        s"id $id must fall back raw")
  }

  test("dHash64: brightness-invariant, spot-sensitive, drop on non-image") {
    def variants(rows: (Long, Long, Int, Int)*) =
      Multimodal.syntheticImageVariants(
        rows.toDF("doc_id", "key", "delta", "spot"))
    // key 6 → w=9, h=8: the 9×8 grid samples source (0,0) exactly once
    val media = variants((1L, 6L, 0, 0), (2L, 6L, 1, 0), (3L, 6L, 0, 50))
    val h = Multimodal.dHash64(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // uniform +1 brightness: every gradient comparison shifts equally
    assert(h(1L)._1 == h(2L)._1)
    // the +50 spot at (0,0) flips exactly the (0,0)-(1,0) gradient bit
    assert(java.lang.Long.bitCount(h(1L)._1 ^ h(3L)._1) == 1L)
    assert(h(1L)._2 == f"${h(1L)._1}%016x")
    // bytes differ even though the hash matches: this is what exact
    // dedup cannot see
    val bytes = media.collect().map(m => m.doc_id -> m.content).toMap
    assert(!java.util.Arrays.equals(bytes(1L), bytes(2L)))
    // non-decodable payloads drop, not crash
    val mixed = media.unionAll(Seq(
      MediaRow(9L, "text/plain", "not an image".getBytes)).toDS())
    assert(Multimodal.dHash64(mixed).count() == 3L)
  }

  test("nearDupImages: banded Hamming join finds the planted pairs") {
    val media = Multimodal.syntheticImageVariants(Seq(
      (1L, 6L, 0, 0), (2L, 6L, 1, 0), (3L, 6L, 0, 50), (4L, 19L, 0, 0))
      .toDF("doc_id", "key", "delta", "spot"))
    val pairs = Multimodal.nearDupImages(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Number]("hamming").longValue()).toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(pairs((1L, 3L)) == 1L)
    assert(pairs((2L, 3L)) == 1L)
    // key 19 (w=9, h=7) is a different image: not within Hamming 3 of key 6
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("imageStats: real decoded dimensions/format; brightness twin shifts mean gray by exactly 1") {
    // key 6: w = 6 % 13 + 3 = 9, h = 6 % 7 + 2 = 8, png (even key)
    val media = Multimodal.syntheticImageVariants(Seq(
      (1L, 6L, 0, 0), (2L, 6L, 1, 0), (3L, 19L, 0, 0))
      .toDF("doc_id", "key", "delta", "spot"))
    val got = Multimodal.imageStats(media).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    assert(got(1L)._1 == "png" && got(1L)._2 == 9 && got(1L)._3 == 8)
    assert(got(3L)._1 == "bmp" && got(3L)._2 == 9 && got(3L)._3 == 7)
    // delta = 1 lifts every channel by 1 → per-pixel gray + 1 →
    // integer mean + 1 exactly ((sum + w·h) div w·h = sum div w·h + 1)
    assert(got(2L)._4 == got(1L)._4 + 1, s"got $got")
    // hand replay of the generator formula for doc 1's mean gray
    val w = 9; val h = 8
    val sum = (for { y <- 0 until h; x <- 0 until w } yield
      ((6L * 31 + x * 7 + y * 13) % 255 +
        (6L * 31 + x * 7 + y * 13 + 5) % 255 +
        (6L * 31 + x * 7 + y * 13 + 10) % 255) / 3).sum
    assert(got(1L)._4 == sum / (w * h), s"got ${got(1L)._4}, want ${sum / (w * h)}")
  }

  test("clusterImages: pair evidence becomes transitive cluster labels") {
    // 1≈2 (brightness twin, Hamming 0) and 1≈3 / 2≈3 (spot, Hamming 1)
    // form one component labeled by its min id; key 19 stays unlabeled
    // (no dup evidence — the clusterDedupFirst convention).
    val media = Multimodal.syntheticImageVariants(Seq(
      (1L, 6L, 0, 0), (2L, 6L, 1, 0), (3L, 6L, 0, 50), (4L, 19L, 0, 0))
      .toDF("doc_id", "key", "delta", "spot"))
    val labels = Multimodal.clusterImages(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("crossNearDupImages: cross-side pairs only, never within a side") {
    val standing = Multimodal.syntheticImageVariants(Seq(
      (1L, 6L, 0, 0), (4L, 19L, 0, 0), (5L, 19L, 1, 0))
      .toDF("doc_id", "key", "delta", "spot"))
    val batch = Multimodal.syntheticImageVariants(Seq(
      (11L, 6L, 1, 0), (12L, 6L, 0, 50), (13L, 19L, 0, 0))
      .toDF("doc_id", "key", "delta", "spot"))
    val pairs = Multimodal.crossNearDupImages(standing, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Number]("hamming").longValue()).toMap
    // batch twin/spot of key 6 ↔ standing original; batch 13 ↔ both
    // standing key-19 variants. 4≈5 (within standing) and 11≈12 (within
    // batch) must NOT appear — the operational contract.
    assert(pairs == Map((11L, 1L) -> 0L, (12L, 1L) -> 1L,
      (13L, 4L) -> 0L, (13L, 5L) -> 0L))
  }

  test("incremental image labels == from-scratch clusterImages over the union") {
    val standingRows = (0L until 16L).map(i => (i, i, 0, 0))
    val batchRows = (0L until 8L).map(i => (i + 100L, i, 1, 0)) :+ (200L, 6L, 0, 50)
    val standing = Multimodal.syntheticImageVariants(
      standingRows.toDF("doc_id", "key", "delta", "spot"))
    val batch = Multimodal.syntheticImageVariants(
      batchRows.toDF("doc_id", "key", "delta", "spot"))
    val all = Multimodal.syntheticImageVariants(
      (standingRows ++ batchRows).toDF("doc_id", "key", "delta", "spot"))
    val grown = graft.operators.Dedup.incrementalClusters(
        Multimodal.clusterImages(standing),
        Multimodal.crossNearDupImages(standing, batch)
          .select(org.apache.spark.sql.functions.col("batch_id").as("doc_a"),
            org.apache.spark.sql.functions.col("corpus_id").as("doc_b"))
          .unionAll(Multimodal.nearDupImages(batch)
            .select(org.apache.spark.sql.functions.col("doc_a"),
              org.apache.spark.sql.functions.col("doc_b"))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = Multimodal.clusterImages(all)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(grown == scratch)
    // and the fold really did something: the batch twins are labeled
    assert(grown.contains(100L) && grown(100L) == 0L)
  }

  test("dHash index: build + append + probe-only cross pairs, own-batch exclusion") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dhash-idx").toString
    val standing = Multimodal.syntheticImageVariants(Seq(
      (1L, 6L, 0, 0), (4L, 19L, 0, 0))
      .toDF("doc_id", "key", "delta", "spot"))
    val batch = Multimodal.syntheticImageVariants(Seq(
      (11L, 6L, 1, 0)).toDF("doc_id", "key", "delta", "spot"))
    Multimodal.buildDHashIndex(standing, dir)
    val probe = Multimodal.crossNearDupImagesIndexed(spark, dir, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe == Set((11L, 1L)))
    // grow, then: full probe sees the appended hash; a probe excluding
    // the appended batch's own partition does not (replay discipline)
    Multimodal.appendToDHashIndex(batch, dir, ingestBatch = 0L)
    val batch2 = Multimodal.syntheticImageVariants(Seq(
      (21L, 6L, 0, 50)).toDF("doc_id", "key", "delta", "spot"))
    val seesAppended = Multimodal.crossNearDupImagesIndexed(spark, dir, batch2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(seesAppended == Set((21L, 1L), (21L, 11L)))
    val excluded = Multimodal.crossNearDupImagesIndexed(spark, dir, batch2,
        excludeIngestBatch = Some(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(excluded == Set((21L, 1L)))
  }

  test("audio fingerprint: gain x2 exactly invariant, dropout flips one bit, codec round-trip") {
    import spark.implicits._
    def variants(rows: (Long, Long, Int, Int)*) =
      Multimodal.syntheticAudioVariants(
        rows.toDF("doc_id", "key", "gain", "retouch"))
    // originals + gain twins + one dropout, through the REAL WAV codec
    val m = variants(
      (7L, 7L, 1, 0), (9L, 9L, 1, 0),
      (107L, 7L, 2, 0), (109L, 9L, 2, 0),
      (207L, 7L, 1, 25))
    val fp = Multimodal.audioFingerprint64(m)
      .select(col("doc_id"), col("afp")).as[(Long, Long)].collect().toMap
    // multiplicative gain scales every window energy by g^2 uniformly:
    // gradient comparisons preserved EXACTLY (Hamming 0, not just small)
    assert(fp(107L) == fp(7L), "gain twin must be fingerprint-identical")
    assert(fp(109L) == fp(9L))
    // the dropout empties exactly one energy window -> exactly one
    // gradient bit flips on this geometry
    assert(java.lang.Long.bitCount(fp(207L) ^ fp(7L)) == 1,
      f"dropout must flip one bit: ${fp(207L) ^ fp(7L)}%016x")
    // distinct keys land distinct fingerprints here (no degenerate hash)
    assert(fp(7L) != fp(9L))
    // the banded pair operators surface exactly those relations
    val pairs = Multimodal.nearDupAudio(m)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((7L, 107L, 0), (9L, 109L, 0), (7L, 207L, 1),
      (107L, 207L, 1)), pairs.toString)
    // and the fingerprint rides a REAL decode: zeroing one sample's two
    // bytes IN THE ENCODED WAV empties its energy window and must reach
    // the fingerprint (no header-only shortcut). A magnitude-only tamper
    // can legitimately vanish — the gradient signature quantizes — so
    // the probe uses the guaranteed-visible dropout edit.
    val tampered = m.map(r =>
      if (r.doc_id == 7L) {
        val b = r.content.clone()
        b(b.length - 3) = 0; b(b.length - 4) = 0
        MediaRow(777L, r.mime, b)
      } else r)(org.apache.spark.sql.Encoders.product[MediaRow])
    val fp2 = Multimodal.audioFingerprint64(tampered)
      .select(col("doc_id"), col("afp")).as[(Long, Long)].collect().toMap
    assert(fp2(777L) != fp(7L), "a payload edit must reach the fingerprint")
  }

  test("blocking-miss recall: complete through Hamming 3, real misses past it; multi-perturbation generators match their siblings at zero") {
    import graft.operators.Dedup
    import spark.implicits._
    // generator identity at the degenerate point: n_drops / n_spots = 0
    // reproduce the sibling generators' bytes EXACTLY (the oracle
    // formulas share the base; a drift here would silently fork fixtures)
    val a0 = Multimodal.syntheticAudioDropouts(
      Seq((7L, 7L, 1, 0), (9L, 9L, 2, 0)).toDF("doc_id", "key", "gain", "n_drops"))
      .collect().map(r => r.doc_id -> r.content.toSeq).toMap
    val a1 = Multimodal.syntheticAudioVariants(
      Seq((7L, 7L, 1, 0), (9L, 9L, 2, 0)).toDF("doc_id", "key", "gain", "retouch"))
      .collect().map(r => r.doc_id -> r.content.toSeq).toMap
    assert(a0 == a1, "0-dropout clips must be byte-identical to the variant generator's")
    val i0 = Multimodal.syntheticImageMultiSpot(
      Seq((4L, 4L, 0, 0), (5L, 5L, 0, 0)).toDF("doc_id", "key", "spot", "n_spots"))
      .collect().map(r => r.doc_id -> r.content.toSeq).toMap
    val i1 = Multimodal.syntheticImageVariants(
      Seq((4L, 4L, 0, 0), (5L, 5L, 0, 0)).toDF("doc_id", "key", "delta", "spot"))
      .collect().map(r => r.doc_id -> r.content.toSeq).toMap
    assert(i0 == i1, "0-spot images must be byte-identical to the variant generator's")

    // the eval: anchors (gain twins, hamming 0) + planted multi-dropouts
    // whose evenly-spread windows reach all four 16-bit bands (nd >= 4)
    val fa = ((0L until 12L).map(k => (k, k, 1, 0)) ++
      (0L until 6L).map(k => (k + 100L, k, 2, 0)) ++
      (0L until 12L).map(k => (k + 200L, k, 1, 4)) ++
      (0L until 6L).map(k => (k + 300L, k, 1, 5)))
      .toDF("doc_id", "key", "gain", "n_drops")
    val sigs = Multimodal.audioFingerprint64(
      Multimodal.syntheticAudioDropouts(fa))
      .select(col("doc_id"), col("afp").as("sigint"))
    val out = Dedup.simhashBlockingRecall(sigs)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L to 8L).toSeq, "one row per H in [0, 8]")
    // pigeonhole completeness: the banding loses NOTHING through H = 3
    out.filter(_._1 <= 3).foreach { case (h, t, f, r) =>
      assert(t == f && (t == 0L || r == 1.0), s"H=$h must be complete: $t vs $f")
    }
    assert(out.head._2 >= 6L, "gain twins must anchor truth at H = 0")
    // found ⊆ truth, both cumulative-monotone
    out.foreach { case (_, t, f, _) => assert(f <= t) }
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq)
    assert(out.map(_._3).toSeq == out.map(_._3).sorted.toSeq)
    // the loosened regime has REAL misses on this fixture — the eval is
    // informative, not vacuous
    assert(out.last._3 < out.last._2,
      "H=8 must show blocking misses on planted all-band flips")
    // found at H = 3 == the production blocker's own pair count
    val prod = Multimodal.nearDupAudio(
      Multimodal.syntheticAudioDropouts(fa)).count()
    assert(out(3)._3 == prod,
      s"found@3 (${out(3)._3}) must equal nearDupAudio's count ($prod)")
  }

  test("pairFilter: cosine gate + either-side dedup drop; missing embedding raises") {
    import spark.implicits._
    def emb(rows: (Long, Seq[Double])*) = rows.toDF("vec_id", "embedding")
    val ex = Seq(1.0, 0.0)
    val ey = Seq(0.0, 1.0)
    // pairs: (1,1) aligned; (2,2) misaligned; (3,3) aligned but text 3
    // dropped; (4,4) aligned but image 4 dropped
    val pairs = Seq((1L, 1L, "en"), (2L, 2L, "en"), (3L, 3L, "de"),
      (4L, 4L, "de")).toDF("text_id", "image_id", "lang")
    val te = emb(1L -> ex, 2L -> ex, 3L -> ey, 4L -> ex)
    val ie = emb(1L -> ex, 2L -> ey, 3L -> ey, 4L -> ex)
    val got = Multimodal.pairFilter(pairs, te, ie,
        textDropped = Seq(3L).toDF("doc_id"),
        imageDropped = Seq(4L).toDF("doc_id"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("en") == ((2L, 1L, 1L)), s"got $got")   // misaligned drops at stage 2
    assert(got("de") == ((2L, 2L, 0L)), s"got $got")   // both dedup-dropped at stage 3
    // a pair citing an unembedded side must raise, not silently vanish
    val err = intercept[Exception] {
      Multimodal.pairFilter(pairs, te.where(col("vec_id") =!= 2L), ie,
        Seq.empty[Long].toDF("doc_id"), Seq.empty[Long].toDF("doc_id")).collect()
    }
    assert(err.getMessage.contains("pairFilter") ||
      Option(err.getCause).exists(_.getMessage.contains("pairFilter")),
      err.getMessage)
    // a DUPLICATE vec_id on either side must raise too (r16 ADVICE): the
    // left join would silently fan the pair out, inflating the funnel's
    // n_aligned/n_final relative to n_pairs
    val dupErr = intercept[Exception] {
      Multimodal.pairFilter(pairs, te.unionAll(emb(2L -> ey)), ie,
        Seq.empty[Long].toDF("doc_id"), Seq.empty[Long].toDF("doc_id")).collect()
    }
    assert(dupErr.getMessage.contains("duplicate vec_id") ||
      Option(dupErr.getCause).exists(_.getMessage.contains("duplicate vec_id")),
      dupErr.getMessage)
  }

  test("sniff dispatches on magic bytes only") {
    val png = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte) ++
      Array.fill[Byte](8)(0)
    assert(Multimodal.sniffImageFormat(png).contains("png"))
    // 'PNG' without the 0x89 lead byte is NOT a PNG
    assert(Multimodal.sniffImageFormat("PNGxxxxx".getBytes).isEmpty)
    assert(Multimodal.sniffImageFormat("BMxx".getBytes).contains("bmp"))
    assert(Multimodal.sniffImageFormat("GIF89a".getBytes).contains("gif"))
    assert(Multimodal.sniffImageFormat(
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)).contains("jpeg"))
    assert(Multimodal.sniffImageFormat("plain text".getBytes).isEmpty)
    assert(Multimodal.sniffImageFormat(Array.emptyByteArray).isEmpty)
  }
}
