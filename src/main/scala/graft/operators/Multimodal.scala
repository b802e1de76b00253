package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media row: opaque bytes + typed metadata (north-star multimodal
  * column model, `BASELINE.json:6`). The decode kernel (`decode`) is REAL
  * for still images — magic-byte sniff + `javax.imageio` (PNG/BMP/GIF/
  * JPEG, the JDK's standard plugins); payloads that are not images fall
  * back to a clearly-marked deterministic stub (audio/video codecs are
  * not in this environment) through the same partition-batched kernel. */
final case class MediaRow(doc_id: Long, mime: String, content: Array[Byte])

/** Decoded features for one media item — real fields when the payload is
  * a decodable image, documented stub fallbacks otherwise. */
final case class DecodedMedia(
    doc_id: Long,
    mime: String,
    byte_len: Long,
    digest: String,       // sha256 hex of the payload
    format: String,       // sniffed: "png" | "bmp" | "gif" | "jpeg" | "raw"
    width: Int,           // real decoded width; raw fallback: byte_len % 640
    height: Int,          // real decoded height; raw fallback: byte_len % 480
    channels: Int,        // pixel component count from the ColorModel
                          // (gray 1, gray+alpha 2, RGB 3, RGBA 4) — NOT the
                          // raster band count, which reads 1 for
                          // palette/indexed GIFs whose pixels are full RGB;
                          // raw fallback: 0
    n_frames: Int,        // real container frame count (animated GIF > 1);
                          // raw fallback: byte_len % 24 + 1
    px_sum: Long)         // sum of decoded 8-bit RGB values — FIRST frame
                          // only for multi-frame containers; raw fallback: -1

/** Decoded features for one audio item — real fields when the payload is
  * a parseable 16-bit PCM WAV (pure-JDK `javax.sound.sampled`), documented
  * stub fallbacks otherwise (this environment has no compressed-audio
  * codecs; MP3/OGG payloads take the raw branch like any opaque binary). */
final case class DecodedAudio(
    doc_id: Long,
    mime: String,
    byte_len: Long,
    format: String,       // "wav" | "raw"
    sample_rate: Int,     // real frames/sec; raw fallback: 0
    channels: Int,        // real channel count; raw fallback: 0
    bits: Int,            // sample size in bits; raw fallback: 0
    n_samples: Long,      // frames per channel; raw fallback: byte_len % 48000
    sample_sum: Long)     // sum of all decoded 16-bit signed samples across
                          // channels — sample-exact evidence of a REAL
                          // parse (PCM is lossless); raw fallback: -1

/** Parsed container metadata for one video item — REAL RIFF/AVI chunk
  * walking (frame decode needs codecs this environment lacks; container
  * structure needs none, and frame count / dims / rate / payload sizes are
  * what a curation pipeline filters on before paying for any decode). */
final case class VideoMeta(
    doc_id: Long,
    mime: String,
    byte_len: Long,
    format: String,       // "avi" | "raw"
    width: Int,           // avih dwWidth; raw fallback: 0
    height: Int,          // avih dwHeight; raw fallback: 0
    n_frames: Long,       // counted ##db/##dc/##wb movi chunks; raw: -1
    usec_per_frame: Long, // avih dwMicroSecPerFrame; raw fallback: 0
    frame_bytes: Long,    // total frame-chunk payload bytes; raw: -1
    frame_sum: Long)      // sum of all frame payload bytes (unsigned) —
                          // byte-exact evidence the walker visited every
                          // frame payload; raw fallback: -1

/** REAL byte-level features for one media item (no stub — pure payload
  * statistics a curation pipeline filters on before any decode). */
final case class ByteFeatures(
    doc_id: Long,
    byte_len: Long,
    n_alpha: Long,
    n_digit: Long,
    n_space: Long,
    n_other: Long)

object Multimodal {

  /** Build a media table from `documents` by treating the UTF-8 text bytes
    * as an opaque payload. In production this column comes straight from
    * parquet BINARY; the rest of the pipeline is payload-agnostic. */
  def mediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      concat(lit("application/x-fake-"), col("source")).as("mime"),
      col("text").cast("binary").as("content"))
      .as[MediaRow]
  }

  /** Magic-byte image-format sniff (same dispatch idea as the reference's
    * gzip sniff, `LASERInputCheckMapper.java:33-51`, applied to image
    * containers): PNG `89 50 4E 47`, BMP `42 4D`, GIF `47 49 46 38`,
    * JPEG `FF D8 FF`. Returns None for anything else. */
  private[graft] def sniffImageFormat(b: Array[Byte]): Option[String] =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some("png")
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') Some("bmp")
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      Some("gif")
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff) Some("jpeg")
    else None

  /** Decode an image payload defensively, in ONE pass: `ImageIO.read`
    * returns null for an unclaimed stream, but a reader that CLAIMS the
    * stream on magic bytes alone still THROWS on a malformed body — the
    * JDK BMP reader claims any stream starting "BM" (e.g. a text document
    * beginning "BMW …") and then errors parsing the fake header. Either
    * outcome must route to the caller's fallback, never crash the task:
    * arbitrary binary payloads are this kernel's contract.
    *
    * Returns (first frame, container frame count). One ImageReader does
    * both — a separate `ImageIO.read` + frame-count pass would parse every
    * payload twice (and an animated GIF's full frame chain twice). */
  private def tryDecode(
      bytes: Array[Byte]): Option[(java.awt.image.BufferedImage, Int)] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val rd = readers.next()
          try {
            rd.setInput(iis)
            val img = rd.read(0)
            val n =
              try math.max(1, rd.getNumImages(true))
              catch { case scala.util.control.NonFatal(_) => 1 }
            Option(img).map((_, n))
          } finally rd.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Sum of all decoded 8-bit channel values (R+G+B per pixel) — the
    * pixel-exact evidence that a REAL decode happened (lossless codecs
    * round-trip this bit-for-bit; a header-only "decode" cannot fake it). */
  private def pixelSum(img: java.awt.image.BufferedImage): Long = {
    var s = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    s
  }

  /** Decode kernel: one *batch* (partition iterator) in, features out —
    * the partition-batched shape a native-library bridge needs (amortized
    * per-partition init, streaming iterator, no driver collect).
    *
    * REAL for still images: payloads sniffing as PNG/BMP/GIF/JPEG decode
    * through `javax.imageio.ImageIO` (pure JDK — no external dependency)
    * to true width/height/band-count plus a pixel checksum. Non-image
    * payloads (this environment has no audio/video codecs) take the
    * documented deterministic stub branch: dimensions derived from the
    * byte length, channels 0, px_sum −1.
    *
    * Scale: per-row work is O(pixels); the kernel is a narrow map over
    * whatever partitioning the media table already has — decode never
    * shuffles, and a heavier native codec slots into the same iterator. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init of decoder context happens HERE once — one
      // MessageDigest per partition; digest() resets the instance after
      // each computation, so reuse across rows is safe.
      val sha256 = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val hex = sha256.digest(r.content).map("%02x".format(_)).mkString
        val len = r.content.length.toLong
        def raw = DecodedMedia(r.doc_id, r.mime, len, hex, "raw",
          width = (len % 640).toInt, height = (len % 480).toInt,
          channels = 0, n_frames = (len % 24).toInt + 1, px_sum = -1L)
        sniffImageFormat(r.content) match {
          case Some(fmt) =>
            // A truncated/malformed container (null OR reader throw — see
            // tryDecode) falls back like any non-image payload.
            tryDecode(r.content).fold(raw) { case (img, nFrames) =>
              // ColorModel component count, not getRaster.getNumBands: an
              // indexed GIF's raster has ONE band (palette indices) even
              // though its pixels are full RGB — a consumer filtering on
              // channels==3 would wrongly drop every palette image.
              DecodedMedia(r.doc_id, r.mime, len, hex, fmt,
                img.getWidth, img.getHeight, img.getColorModel.getNumComponents,
                n_frames = nFrames, px_sum = pixelSum(img))
            }
          case None => raw
        }
      }
    }
  }

  /** Deterministic image fixtures encoded through the REAL codec: for each
    * doc id, an RGB image whose dims and pixels derive from the id alone
    * (w = id%13+3, h = id%7+2, px(x,y,c) = (id·31 + x·7 + y·13 + c·5) mod
    * 256), written via `ImageIO.write` as PNG (even ids) or BMP (odd ids).
    * Both are lossless, so a DuckDB oracle can compute the expected
    * decoded pixels by formula while the bytes genuinely round-trip
    * through the codec — `decode`/`resizeImages` results are then
    * pixel-exactly checkable with no image library on the oracle side. */
  def syntheticImages(ids: DataFrame): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        // negative ids would make the % dims non-positive — fail clearly,
        // not inside the image constructor
        require(id >= 0, s"syntheticImages requires non-negative ids, got $id")
        val w = (id % 13 + 3).toInt
        val h = (id % 7 + 2).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            def v(c: Int): Int = ((id * 31 + x * 7 + y * 13 + c * 5) % 256).toInt
            img.setRGB(x, y, (v(0) << 16) | (v(1) << 8) | v(2))
            x += 1
          }
          y += 1
        }
        val fmt = if (id % 2 == 0) "png" else "bmp"
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, bos)
        MediaRow(id, s"image/$fmt", bos.toByteArray)
      }
    }
  }

  /** Deterministic image fixtures WITH controlled perturbations, through
    * the real codec — the near-dup planting generator for [[dHash64]] /
    * [[nearDupImages]]: one row per `(doc_id, key, delta, spot)`, an RGB
    * image whose dims derive from `key` alone (w = key%13+3, h = key%7+2)
    * and whose pixels are `px(x,y,c) = (key·31 + x·7 + y·13 + c·5 +
    * (x==0 && y==0 ? spot : 0)) mod 255 + delta` — the `% 255` (not 256)
    * head-room makes `delta ∈ {0, 1}` a uniform brightness shift with NO
    * wrap, so a delta twin has byte-different pixels (different digest,
    * different px_sum — exact dedup is blind to it) but an IDENTICAL
    * dHash (every gradient comparison shifts equally); `spot` perturbs
    * the single source pixel (0,0), flipping at most the gradient bits of
    * the grid cells that sample it. PNG for even keys, BMP for odd — both
    * lossless, so a DuckDB oracle recomputes the hash by formula
    * (`syntheticImages`' trick, aimed at the near-dup operator). */
  def syntheticImageVariants(rows: DataFrame): Dataset[MediaRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("doc_id").cast("long"), col("key").cast("long"),
        col("delta").cast("int"), col("spot").cast("int"))
      .as[(Long, Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, key, delta, spot) =>
          require(key >= 0 && delta >= 0 && delta <= 1 && spot >= 0,
            s"variant ($id, $key, $delta, $spot) out of contract")
          val w = (key % 13 + 3).toInt
          val h = (key % 7 + 2).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val s = if (x == 0 && y == 0) spot else 0
              def v(c: Int): Int =
                ((key * 31 + x * 7 + y * 13 + c * 5 + s) % 255).toInt + delta
              img.setRGB(x, y, (v(0) << 16) | (v(1) << 8) | v(2))
              x += 1
            }
            y += 1
          }
          val fmt = if (key % 2 == 0) "png" else "bmp"
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, bos)
          MediaRow(id, s"image/$fmt", bos.toByteArray)
        }
      }
  }

  /** Perceptual hash (dHash) over the REAL decoded pixels: grayscale
    * ((R+G+B)/3, integer), nearest-neighbor downsample to a 9×8 grid
    * (source pixel (gx·w/9, gy·h/8) — `resizeImages`' mapping), then one
    * gradient bit per adjacent horizontal pair: bit (gy·8+gx) set iff
    * gray(gx,gy) < gray(gx+1,gy). 64 bits, robust to uniform brightness/
    * contrast shifts and resizing — the standard cheap image near-dup
    * signature (the image-side analogue of `Dedup.simhash64`). Returns
    * `(doc_id, phash, phash_hex)`; non-decodable payloads DROP (flatMap,
    * `resizeImages`' failure routing). Narrow partition-batched map — no
    * shuffle, O(81) pixel reads per image after decode. */
  def dHash64(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        tryDecode(r.content).map { case (img, _) =>
          val w = img.getWidth
          val h = img.getHeight
          def gray(gx: Int, gy: Int): Int = {
            val rgb = img.getRGB(gx * w / 9, gy * h / 8)
            (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          }
          var hash = 0L
          var gy = 0
          while (gy < 8) {
            var gx = 0
            while (gx < 8) {
              if (gray(gx, gy) < gray(gx + 1, gy)) hash |= 1L << (gy * 8 + gx)
              gx += 1
            }
            gy += 1
          }
          (r.doc_id, hash, f"$hash%016x")
        }
      }
    }.toDF("doc_id", "phash", "phash_hex")
  }

  /** Per-image SUMMARY stats over real decoded pixels — the feature row
    * the image-side drift monitor bins (`mm_drift`): format, dimensions,
    * and the integer mean gray `⌊Σ⌊(r+g+b)/3⌋ / (w·h)⌋` over EVERY pixel
    * (not [[dHash64]]'s 9×8 sample — a mean must see all pixels or a
    * localized retouch vanishes). All-integer arithmetic, so the DuckDB
    * oracle replays it exactly from the synthetic-variant pixel formula.
    * Non-decodable payloads DROP (flatMap — the dHash64 routing). Narrow
    * partition-batched map, O(w·h) reads per image, no shuffle. */
  def imageStats(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        for {
          fmt <- sniffImageFormat(r.content)
          (img, _) <- tryDecode(r.content)
        } yield {
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              x += 1
            }
            y += 1
          }
          (r.doc_id, fmt, w, h, sum / (w.toLong * h))
        }
      }
    }.toDF("doc_id", "format", "width", "height", "mean_gray")
  }

  /** Image near-dup pairs: Hamming distance ≤ `maxHamming` over [[dHash64]]
    * signatures — [[graft.operators.Dedup.simhashPairs]]' 16-bit-band
    * pigeonhole blocking applied verbatim to the image modality (zero
    * recall loss for maxHamming ≤ 3, no O(n²) pair space, no corpus
    * broadcast). This is what exact dedup cannot do for media: a
    * re-encoded, brightness-shifted or slightly-retouched image hashes
    * to a different SHA but the same (or near) dHash. */
  def nearDupImages(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairs(
      dHash64(media).select(col("doc_id"), col("phash").as("sigint")),
      maxHamming)

  /** Near-dup CLUSTER LABELS for the image modality: [[nearDupImages]]
    * pairs fed through [[graft.operators.Dedup.connectedComponents]] —
    * the text chain (`dd_cluster`) applied to media, closing the gap
    * between pair evidence and the decisions a pipeline makes from it.
    * Returns `(doc_id, cluster_id)` for PAIR-BEARING images only (the
    * `clusterDedupFirst` convention: absent = no dup evidence). Compose
    * downstream exactly like text: a keep-first purge drops
    * `doc_id =!= cluster_id`, and `Sampling.clusterSplit` over these
    * labels yields leakage-safe folds (a near-dup image pair can never
    * straddle train/test) — the machinery is modality-agnostic, only the
    * pair evidence differs. Scale: the pairs are band-blocked (never
    * all-pairs) and CC is the large-star/small-star loop with bounded
    * local finish — both already 100 TB-shaped. */
  def clusterImages(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    Dedup.connectedComponents(
      nearDupImages(media, maxHamming).select(col("doc_a"), col("doc_b")))

  /** CROSS-corpus image near-dedup: Hamming pairs between an ARRIVING
    * image batch and a STANDING corpus — `(batch_id, corpus_id,
    * hamming)` via [[graft.operators.Dedup.simhashCrossPairs]] over both
    * sides' dHashes. The text ladder's `dd_cross_neardup` applied to the
    * image modality: the standing corpus is never re-paired against
    * itself per arriving batch, candidates come from ONE banded
    * equi-join, and the decode cost is one pass per side (the standing
    * side's decode is what [[buildDHashIndex]] amortizes away). */
  def crossNearDupImages(standing: Dataset[MediaRow], batch: Dataset[MediaRow],
      maxHamming: Int = 3): DataFrame =
    Dedup.simhashCrossPairs(
      dHash64(standing).select(col("doc_id"), col("phash").as("sigint")),
      dHash64(batch).select(col("doc_id"), col("phash").as("sigint")),
      maxHamming)

  /** Build the PERSISTED standing-corpus dHash index — the probe-only
    * layout a production image-ingest stream needs: re-DECODING the
    * standing corpus per arriving batch (as [[crossNearDupImages]] does)
    * re-reads every corpus image byte every increment, while the hash
    * table is 8 bytes/image. Layout mirrors the exact-window index's
    * batchId-keyed discipline: `dir/hashes/ingest_batch=<id>` parquet of
    * `(doc_id, phash)`; the build owns partition −1, streaming appends
    * own ids ≥ 0, each an idempotent overwrite (replay-exact). */
  def buildDHashIndex(media: Dataset[MediaRow], dir: String): Unit =
    buildSigIndex(dHash64(media).select(col("doc_id"), col("phash")), dir)

  /** Grow a [[buildDHashIndex]] index with an arriving batch's hashes —
    * one narrow decode+hash pass over the batch, an overwrite into the
    * batch's own partition (replays are byte-identical; the standing
    * partitions are never touched). */
  def appendToDHashIndex(media: Dataset[MediaRow], dir: String,
      ingestBatch: Long): Unit =
    appendToSigIndex(dHash64(media).select(col("doc_id"), col("phash")),
      dir, ingestBatch)

  /** The shared 8-bytes-per-item signature-index layout behind the dHash
    * (image) and audio-fingerprint indexes — `dir/hashes/ingest_batch=
    * <id>` parquet of `(doc_id, <sig>)`, build owns partition −1,
    * streaming appends own ids ≥ 0, each an idempotent overwrite
    * (replay-exact). The signature column keeps its family's name
    * (`phash` / `afp`) so an index can never be probed by the wrong
    * modality's reader. */
  private def buildSigIndex(sigs: DataFrame, dir: String): Unit = {
    val spark = sigs.sparkSession
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    sigs.write.mode("overwrite").parquet(s"$dir/hashes/ingest_batch=-1")
  }

  private def appendToSigIndex(sigs: DataFrame, dir: String,
      ingestBatch: Long): Unit =
    sigs.write.mode("overwrite")
      .parquet(s"$dir/hashes/ingest_batch=$ingestBatch")

  /** Fold a signature index's accumulated `ingest_batch=` partitions back
    * into the build's base partition (−1) — the append-side COMPACTION
    * verb the streaming loops' scaladoc prescribes: each micro-batch
    * writes its own tiny partition forever, so after 10⁴ batches every
    * probe pays a 10⁴-dir listing and tiny-file reads. One fold restores
    * O(1) partitions with byte-identical probe results (rows move, no
    * row changes). Runs under [[graft.operators.Purge.rewritePartitions]]'s
    * two-phase commit: the folded base stages (consuming the live-reading
    * union while nothing live is touched), then base-swap + batch-drops
    * roll forward under one marker — crash-safe at every window, rerun
    * idempotent.
    *
    * Streaming caveat ([[graft.operators.Layout.compactKeyed]]'s):
    * compact only while the owning stream is STOPPED and past its last
    * checkpoint commit — a crash-replay of a folded micro-batch would
    * re-append rows the base already holds, and the loop's
    * own-partition probe exclusion cannot see them inside the base. */
  def compactDHashIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = compactSigIndex(spark, dir)

  /** [[compactDHashIndex]]'s audio twin — same layout, same fold. */
  def compactAudioFpIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = compactSigIndex(spark, dir)

  private def compactSigIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/hashes")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no signature index at $dir — build it first")
    Purge.repairPartitionRewrite(spark, s"$dir/hashes")
    // snapshot the partition set, then read exactly that set (the
    // compactKeyed discipline): the commit folds precisely these
    val parts = fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("ingest_batch=")).sorted
    if (parts.size <= 1) return // already a single base
    val folded = spark.read.parquet(parts.map(p => s"$dir/hashes/$p"): _*)
    val repl: Seq[(String, Option[DataFrame])] =
      ("ingest_batch=-1" -> Some(folded)) +:
        parts.filter(_ != "ingest_batch=-1").map(p => p -> Option.empty[DataFrame])
    Purge.rewritePartitions(spark, s"$dir/hashes", repl)
  }

  /** Remove an image-id set from a [[buildDHashIndex]] index — the
    * takedown path of the image dedup ladder: one narrow id-column scan
    * of the hash table (8 bytes/image — never the image bytes) finds the
    * touched `ingest_batch` partitions, each rewritten minus the purged
    * ids under [[graft.operators.Purge.rewritePartitions]]'s two-phase
    * commit; untouched partitions are never read. Probes
    * ([[crossNearDupImagesIndexed]]) are unchanged — the resulting table
    * is exactly an index built without the docs. NOTE the streaming
    * interaction: a purged doc's ORIGINAL ingest partition shrinks, so a
    * crash-replay of that old micro-batch would re-append it —
    * [[appendToDHashIndex]] replays are whole-partition overwrites, so
    * run purges only over batches the stream has committed past (the
    * owner-only discipline every two-phase rewrite here carries). */
  def purgeFromDHashIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, docIds: org.apache.spark.sql.DataFrame): Unit =
    Purge.purgePartitionedIndex(spark, s"$dir/hashes", "ingest_batch",
      "doc_id", docIds)

  /** The standing hash table of a [[buildDHashIndex]] index —
    * optionally EXCLUDING one ingest batch's partition (a replayed
    * micro-batch must never match its own failed attempt's append;
    * `Streams.noveltyIngest`'s own-partition exclusion). Directory
    * listing via the Hadoop FS API so exclusion is partition pruning,
    * not a scan-then-filter. */
  def standingDHashes(spark: org.apache.spark.sql.SparkSession, dir: String,
      excludeIngestBatch: Option[Long] = None): DataFrame =
    standingSigs(spark, dir, "phash", excludeIngestBatch)

  private[graft] def standingSigs(spark: org.apache.spark.sql.SparkSession,
      dir: String, sigCol: String,
      excludeIngestBatch: Option[Long]): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/hashes")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no signature index at $dir — build it first")
    val parts = fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("ingest_batch="))
      .filterNot(p => excludeIngestBatch.exists(b => p.getName == s"ingest_batch=$b"))
    require(parts.nonEmpty, s"signature index at $dir has no readable partitions")
    spark.read.schema(s"doc_id LONG, $sigCol LONG")
      .parquet(parts.map(_.toString): _*)
  }

  /** Owner-side SESSION over a signature-index layout (`dir/hashes`,
    * [[buildDHashIndex]] / [[buildAudioFpIndex]]) — the sig-loop analogue
    * of [[graft.operators.Dedup.CrossIndexSession]]: while a
    * [[graft.streaming.Streams]] dedup loop runs, it is the layout's
    * only writer, so the standing signature table (8 bytes/doc + the
    * ingest_batch attribution) is read from parquet ONCE, kept persisted,
    * and maintained in place as batches land — per-batch probes stop
    * re-listing and re-scanning the partition tree. The per-batch replay
    * exclusion (`excludeIngestBatch`) becomes a filter over the cached
    * ingest_batch column, and [[extend]] REPLACES any cached rows of its
    * batch before unioning (exact parity with the keyed partition
    * overwrite, so an in-session retry never leaves duplicates). The
    * union/filter tree collapses into one checkpoint every `rebaseEvery`
    * extensions. `close()` releases every cache; the loops wire it to the
    * query-termination listener. */
  final class SigIndexSession private[operators] (
      spark: org.apache.spark.sql.SparkSession, dir: String, sigCol: String,
      rebaseEvery: Int = 32) {
    private var standing: DataFrame = null // (doc_id, sigCol, ingest_batch)
    private var extensions = 0

    private def load(): DataFrame = {
      if (standing == null) {
        val root = new org.apache.hadoop.fs.Path(s"$dir/hashes")
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        require(fs.exists(root), s"no signature index at $dir — build it first")
        // EAGER checkpoint, not lazy persist: a replayed batch's keyed
        // partition OVERWRITE deletes the files a lazy plan would still
        // reference (SessionSpec pins the retry), so the base must hold
        // its rows with no file lineage before any overwrite can land
        standing = spark.read
          .schema(s"doc_id LONG, $sigCol LONG, ingest_batch LONG")
          .option("basePath", root.toString)
          .parquet(root.toString)
          .localCheckpoint(true)
      }
      standing
    }

    /** The standing `(doc_id, sigCol)` table, with a replayed batch's own
      * partition excluded exactly as [[standingSigs]] excludes it. */
    def sigs(excludeIngestBatch: Option[Long]): DataFrame = {
      val s = load()
      excludeIngestBatch.fold(s)(b => s.where(col("ingest_batch") =!= b))
        .select(col("doc_id"), col(sigCol))
    }

    /** Fold a just-written batch partition into the cache (call AFTER the
      * keyed overwrite lands): cached rows of the same ingest_batch are
      * replaced, not duplicated — a retried batch converges. The rows are
      * EAGERLY checkpointed: they outlive the micro-batch that computed
      * them (the loop unpersists its decode cache right after), so their
      * lineage must not reach back to the streaming source. */
    def extend(batchSigs: DataFrame, ingestBatch: Long): Unit = {
      val rows = batchSigs.select(col("doc_id"), col(sigCol),
        lit(ingestBatch).as("ingest_batch")).localCheckpoint(true)
      standing = load().where(col("ingest_batch") =!= ingestBatch)
        .unionAll(rows)
      extensions += 1
      if (extensions % rebaseEvery == 0)
        standing = standing.localCheckpoint(true) // bound plan depth
      ()
    }

    /** Drop every cache (checkpoint blocks are GC-reclaimed). */
    def close(): Unit = { standing = null }
  }

  /** Open a [[SigIndexSession]] over an existing signature index. */
  def openSigIndexSession(spark: org.apache.spark.sql.SparkSession,
      dir: String, sigCol: String): SigIndexSession =
    new SigIndexSession(spark, dir, sigCol)

  /** Probe an arriving image batch against the PERSISTED index:
    * `(batch_id, corpus_id, hamming)` — [[crossNearDupImages]] with the
    * standing side read from the hash table (zero standing-image
    * decodes; the index is 8 bytes/image, so the probe's corpus-side
    * cost is a hash-table scan + the banded equi-join). */
  def crossNearDupImagesIndexed(spark: org.apache.spark.sql.SparkSession,
      dir: String, batch: Dataset[MediaRow], maxHamming: Int = 3,
      excludeIngestBatch: Option[Long] = None): DataFrame =
    Dedup.simhashCrossPairs(
      standingDHashes(spark, dir, excludeIngestBatch)
        .select(col("doc_id"), col("phash").as("sigint")),
      dHash64(batch).select(col("doc_id"), col("phash").as("sigint")),
      maxHamming)

  /** WAV container sniff: RIFF chunk id at 0, WAVE form type at 8 — the
    * same magic-byte dispatch as `sniffImageFormat`. */
  private[graft] def sniffWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Deterministic audio fixtures encoded through the REAL codec: for each
    * doc id, 16-bit signed PCM whose rate/channels/length/samples derive
    * from the id alone (rate = 8000·(id%3+1), ch = id%2+1, frames =
    * id%50+10, sample(i,c) = ((id·31 + i·7 + c·13) mod 65536) − 32768),
    * written via `javax.sound.sampled.AudioSystem` as a WAV container.
    * PCM is lossless, so a DuckDB oracle recomputes the expected header
    * fields AND the full sample sum by formula while the bytes genuinely
    * round-trip through the codec — the `syntheticImages` trick applied to
    * the audio modality. */
  def syntheticAudio(ids: DataFrame): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        require(id >= 0, s"syntheticAudio requires non-negative ids, got $id")
        val rate = (8000 * (id % 3 + 1)).toInt
        val ch = (id % 2 + 1).toInt
        val frames = (id % 50 + 10).toInt
        val data = new Array[Byte](frames * ch * 2)
        var i = 0
        while (i < frames) {
          var c = 0
          while (c < ch) {
            val v = (((id * 31 + i * 7 + c * 13) % 65536) - 32768).toInt
            val off = (i * ch + c) * 2
            data(off) = (v & 0xff).toByte        // WAV PCM is little-endian
            data(off + 1) = ((v >> 8) & 0xff).toByte
            c += 1
          }
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, ch, /*signed=*/ true, /*bigEndian=*/ false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRow(id, "audio/wav", bos.toByteArray)
      }
    }
  }

  /** Audio decode kernel — REAL for 16-bit signed PCM WAV through
    * `javax.sound.sampled.AudioSystem` (pure JDK): true sample rate /
    * channel count / bit depth / frame count plus a sample-sum checksum
    * (both byte orders handled; PCM is lossless so the sum is exact).
    * Anything else — non-audio payloads, compressed codecs this
    * environment lacks, malformed RIFF headers (AudioSystem throws on a
    * claimed-but-truncated container, same contract note as `tryDecode`) —
    * takes the documented deterministic raw branch. Same partition-batched
    * shape as `decode`: narrow map, no shuffle, streaming iterator. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val len = r.content.length.toLong
        def raw = DecodedAudio(r.doc_id, r.mime, len, "raw",
          sample_rate = 0, channels = 0, bits = 0,
          n_samples = len % 48000, sample_sum = -1L)
        if (!sniffWav(r.content)) raw
        else try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.content))
          try {
            val f = ais.getFormat
            val pcm16 =
              f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                f.getSampleSizeInBits == 16
            if (!pcm16) raw
            else {
              val bytes = ais.readAllBytes()
              var s = 0L
              var i = 0
              while (i + 1 < bytes.length) {
                val v =
                  if (f.isBigEndian) (bytes(i) << 8) | (bytes(i + 1) & 0xff)
                  else (bytes(i + 1) << 8) | (bytes(i) & 0xff)
                s += v.toShort
                i += 2
              }
              DecodedAudio(r.doc_id, r.mime, len, "wav",
                sample_rate = f.getSampleRate.toInt,
                channels = f.getChannels,
                bits = f.getSampleSizeInBits,
                n_samples = bytes.length.toLong / (2L * f.getChannels),
                sample_sum = s)
            }
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => raw }
      }
    }
  }

  /** Deterministic audio VARIANT fixtures through the real codec — the
    * [[syntheticImageVariants]] trick for the audio modality, built for
    * the dedup ladder's perturbation geometry: each row
    * `(doc_id, key, gain, retouch)` encodes 16-bit PCM WAV whose
    * rate/channels/frames derive from `key` (so variants share the
    * original's geometry) and whose samples are
    * `base(i,c) · gain`, with the sample at interleaved index
    * `retouch` ZEROED when retouch > 0 (a single-sample dropout — the
    * click-removal edit) and `base = ((key·31 + i·7 + c·13) mod 16000)
    * − 8000`. The ±8000
    * base leaves headroom so a ×2 gain stays in 16-bit range with no
    * clamping — and MULTIPLICATIVE gain scales every window energy by
    * g² uniformly, so [[audioFingerprint64]]'s gradient bits are
    * EXACTLY invariant (the audio analogue of dHash's brightness-shift
    * invariance), while a dropout zeroes one window's energy and flips
    * the ≤ 2 adjacent gradient bits (exactly 1 on the fixture —
    * MultimodalSpec pins it). The oracle recomputes samples by this
    * formula while the bytes genuinely round-trip the codec. */
  def syntheticAudioVariants(rows: DataFrame): Dataset[MediaRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("doc_id"), col("key"), col("gain"), col("retouch"))
      .as[(Long, Long, Int, Int)].mapPartitions { it =>
        it.map { case (id, key, gain, retouch) =>
          require(key >= 0, s"syntheticAudioVariants requires key >= 0, got $key")
          require(gain == 1 || gain == 2, s"gain must be 1 or 2, got $gain")
          val rate = (8000 * (key % 3 + 1)).toInt
          val ch = (key % 2 + 1).toInt
          val frames = (key % 50 + 10).toInt
          val data = new Array[Byte](frames * ch * 2)
          var i = 0
          while (i < frames) {
            var c = 0
            while (c < ch) {
              val idx = i * ch + c
              var v = (((key * 31 + i * 7 + c * 13) % 16000) - 8000).toInt * gain
              if (retouch > 0 && idx == retouch) v = 0
              val off = idx * 2
              data(off) = (v & 0xff).toByte
              data(off + 1) = ((v >> 8) & 0xff).toByte
              c += 1
            }
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            rate.toFloat, 16, ch, /*signed=*/ true, /*bigEndian=*/ false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          MediaRow(id, "audio/wav", bos.toByteArray)
        }
      }
  }

  /** Multi-DROPOUT audio variants — [[syntheticAudioVariants]]' formula
    * with `n_drops` single-sample dropouts instead of one: the samples at
    * interleaved indices `(j·n)/(n_drops+1)`, j = 1..n_drops (n = ch ·
    * frames — evenly spread, so the drops land in well-separated energy
    * windows), are ZEROED; everything else (geometry from `key`, base
    * sample `((key·31 + i·7 + c·13) mod 16000) − 8000` times `gain`, real
    * WAV round-trip) is the variant generator's verbatim. Each dropout
    * flips ≤ 2 adjacent [[audioFingerprint64]] gradient bits, so rows at
    * n_drops 2..4 plant pair distances in the LOOSENED Hamming regime
    * (4–8) — the PCM-edit stand-in the offline env can build with the
    * real codec — which the blocking-miss eval (`mm_audio_block_recall`)
    * measures. Rows: `(doc_id, key, gain, n_drops)`. */
  def syntheticAudioDropouts(rows: DataFrame): Dataset[MediaRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("doc_id"), col("key"), col("gain"), col("n_drops"))
      .as[(Long, Long, Int, Int)].mapPartitions { it =>
        it.map { case (id, key, gain, nd) =>
          require(key >= 0, s"syntheticAudioDropouts requires key >= 0, got $key")
          require(gain == 1 || gain == 2, s"gain must be 1 or 2, got $gain")
          require(nd >= 0 && nd <= 16, s"n_drops must be in [0, 16], got $nd")
          val rate = (8000 * (key % 3 + 1)).toInt
          val ch = (key % 2 + 1).toInt
          val frames = (key % 50 + 10).toInt
          val n = frames * ch
          val drops = (1 to nd).map(j => (j * n) / (nd + 1)).toSet
          val data = new Array[Byte](n * 2)
          var i = 0
          while (i < frames) {
            var c = 0
            while (c < ch) {
              val idx = i * ch + c
              var v = (((key * 31 + i * 7 + c * 13) % 16000) - 8000).toInt * gain
              if (drops.contains(idx)) v = 0
              val off = idx * 2
              data(off) = (v & 0xff).toByte
              data(off + 1) = ((v >> 8) & 0xff).toByte
              c += 1
            }
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            rate.toFloat, 16, ch, /*signed=*/ true, /*bigEndian=*/ false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          MediaRow(id, "audio/wav", bos.toByteArray)
        }
      }
  }

  /** Multi-SPOT image variants — [[syntheticImageVariants]]' formula with
    * `n_spots` perturbed pixels instead of one: pixel (x, y) takes the
    * `+spot` perturbation (inside the mod-255 wrap, per channel) iff some
    * j < n_spots has `x = (j·w)/9 ∧ y = ((j·8/n_spots)·h)/8` — source
    * pixels [[dHash64]]'s 9×8 grid samples, with the grid ROWS spread
    * evenly over 0..7 so the flipped bits spread across ALL FOUR 16-bit
    * bands once n_spots ≥ 4 (each grid row is one signature byte; a
    * diagonal placement would leave bands 2–3 untouched and the banding
    * trivially complete). Each spot flips ≤ 2 adjacent gradient bits, so
    * rows at n_spots 4..6 plant pair distances in the loosened Hamming
    * regime (4–8) — the JPEG-quality-shift stand-in the offline env can
    * build with the real PNG/BMP codecs — for the blocking-miss eval
    * (`mm_block_recall`).
    * Membership is EXISTS, not additive: grid cells colliding on a source
    * pixel (tiny fixtures) perturb it once, in both engines. Rows:
    * `(doc_id, key, spot, n_spots)`. */
  def syntheticImageMultiSpot(rows: DataFrame): Dataset[MediaRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("doc_id").cast("long"), col("key").cast("long"),
        col("spot").cast("int"), col("n_spots").cast("int"))
      .as[(Long, Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, key, spot, ns) =>
          require(key >= 0 && spot >= 0 && ns >= 0 && ns <= 8,
            s"multi-spot variant ($id, $key, $spot, $ns) out of contract")
          val w = (key % 13 + 3).toInt
          val h = (key % 7 + 2).toInt
          val spots =
            (0 until ns).map(j => ((j * w) / 9, ((j * 8 / ns) * h) / 8)).toSet
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val s = if (spots.contains((x, y))) spot else 0
              def v(c: Int): Int =
                ((key * 31 + x * 7 + y * 13 + c * 5 + s) % 255).toInt
              img.setRGB(x, y, (v(0) << 16) | (v(1) << 8) | v(2))
              x += 1
            }
            y += 1
          }
          val fmt = if (key % 2 == 0) "png" else "bmp"
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, bos)
          MediaRow(id, s"image/$fmt", bos.toByteArray)
        }
      }
  }

  /** 64-bit AUDIO fingerprint — the dHash recipe applied to decoded PCM
    * (VERDICT r14 #3): the interleaved sample stream splits into 65
    * near-equal windows (`w(idx) = idx·65 / n`, integer), each window's
    * ENERGY is the exact integer `Σ s²` (long — no float accumulation),
    * and bit `w` is set iff `e(w+1) > e(w)` — an energy-GRADIENT
    * signature invariant under uniform gain (energies scale by g²
    * together, strict comparisons preserved exactly) and local under
    * retouches (one window moved flips ≤ 2 adjacent bits). Returns
    * `(doc_id, afp, afp_hex)` — bit `w` at `1L << w`, the [[dHash64]]
    * packing. Real decode via `javax.sound.sampled` for PCM-16 WAV
    * (either byte order); any other payload takes the documented
    * deterministic fallback — its raw bytes read as little-endian 16-bit
    * samples — so the operator is total and a header-only shortcut
    * cannot reproduce the WAV branch (the oracle recomputes energies
    * from the sample formula). Narrow partition-batched map, one pass
    * over the samples, no shuffle. */
  def audioFingerprint64(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        def leSamples(bytes: Array[Byte], bigEndian: Boolean): Array[Int] = {
          val out = new Array[Int](bytes.length / 2)
          var i = 0
          while (i + 1 < bytes.length) {
            out(i / 2) =
              if (bigEndian) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort.toInt
              else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort.toInt
            i += 2
          }
          out
        }
        val samples: Array[Int] =
          if (!sniffWav(r.content)) leSamples(r.content, bigEndian = false)
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.content))
            try {
              val f = ais.getFormat
              if (f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                  f.getSampleSizeInBits == 16)
                leSamples(ais.readAllBytes(), f.isBigEndian)
              else leSamples(r.content, bigEndian = false)
            } finally ais.close()
          } catch {
            case scala.util.control.NonFatal(_) =>
              leSamples(r.content, bigEndian = false)
          }
        val n = samples.length
        val e = new Array[Long](65)
        var i = 0
        while (i < n) {
          val w = ((i.toLong * 65L) / n).toInt
          val v = samples(i).toLong
          e(w) += v * v
          i += 1
        }
        var afp = 0L
        var w = 0
        while (w < 64) {
          if (e(w + 1) > e(w)) afp |= 1L << w
          w += 1
        }
        (r.doc_id, afp, f"$afp%016x")
      }
    }.toDF("doc_id", "afp", "afp_hex")
  }

  /** Audio near-dup pairs: Hamming ≤ `maxHamming` over
    * [[audioFingerprint64]] signatures — the text/image banding
    * ([[graft.operators.Dedup.simhashPairs]]' 16-bit pigeonhole blocks)
    * applied verbatim to the third modality. A re-encoded or
    * gain-scaled copy hashes to a different SHA but the same afp. */
  def nearDupAudio(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairs(
      audioFingerprint64(media).select(col("doc_id"), col("afp").as("sigint")),
      maxHamming)

  /** CROSS-corpus audio near-dedup: `(batch_id, corpus_id, hamming)`
    * between an arriving batch and a standing corpus via
    * [[graft.operators.Dedup.simhashCrossPairs]] — one banded equi-join,
    * within-side pairs never generated, the standing side decoded once
    * (the indexed form below persists the 8-byte fingerprints exactly as
    * [[buildDHashIndex]] does for images). */
  def crossNearDupAudio(standing: Dataset[MediaRow], batch: Dataset[MediaRow],
      maxHamming: Int = 3): DataFrame =
    Dedup.simhashCrossPairs(
      audioFingerprint64(standing).select(col("doc_id"), col("afp").as("sigint")),
      audioFingerprint64(batch).select(col("doc_id"), col("afp").as("sigint")),
      maxHamming)

  /** Build the PERSISTED audio-fingerprint index — the audio modality's
    * [[buildDHashIndex]]: re-decoding the standing corpus per arriving
    * batch re-reads every audio byte every increment, while the
    * fingerprint table is 8 bytes/clip. Same layout, same ingest-keyed
    * replay discipline, same purge path. */
  def buildAudioFpIndex(media: Dataset[MediaRow], dir: String): Unit =
    buildSigIndex(audioFingerprint64(media).select(col("doc_id"), col("afp")), dir)

  /** Grow a [[buildAudioFpIndex]] index with an arriving batch — one
    * decode+fingerprint pass, an idempotent overwrite of the batch's own
    * ingest partition. */
  def appendToAudioFpIndex(media: Dataset[MediaRow], dir: String,
      ingestBatch: Long): Unit =
    appendToSigIndex(audioFingerprint64(media).select(col("doc_id"), col("afp")),
      dir, ingestBatch)

  /** The standing fingerprint table of a [[buildAudioFpIndex]] index,
    * optionally excluding one ingest partition (replay exactness). */
  def standingAudioFps(spark: org.apache.spark.sql.SparkSession, dir: String,
      excludeIngestBatch: Option[Long] = None): DataFrame =
    standingSigs(spark, dir, "afp", excludeIngestBatch)

  /** Probe an arriving audio batch against the PERSISTED index: zero
    * standing-clip decodes — the probe's corpus-side cost is the 8-byte
    * fingerprint scan plus the banded equi-join. */
  def crossNearDupAudioIndexed(spark: org.apache.spark.sql.SparkSession,
      dir: String, batch: Dataset[MediaRow], maxHamming: Int = 3,
      excludeIngestBatch: Option[Long] = None): DataFrame =
    Dedup.simhashCrossPairs(
      standingAudioFps(spark, dir, excludeIngestBatch)
        .select(col("doc_id"), col("afp").as("sigint")),
      audioFingerprint64(batch).select(col("doc_id"), col("afp").as("sigint")),
      maxHamming)

  /** Remove a clip-id set from a [[buildAudioFpIndex]] index — the dHash
    * purge discipline verbatim ([[purgeFromDHashIndex]]): touched ingest
    * partitions anti-join-rewrite under the two-phase marker, 8
    * bytes/clip, never the audio bytes. Same owner-only streaming
    * caveat. */
  def purgeFromAudioFpIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, docIds: org.apache.spark.sql.DataFrame): Unit =
    Purge.purgePartitionedIndex(spark, s"$dir/hashes", "ingest_batch",
      "doc_id", docIds)

  /** TEXT↔IMAGE pair curation (r15) — the LAION-style joint filter a VLM
    * corpus actually is: a `(text_id, image_id, lang)` pair survives iff
    * its caption and image EMBEDDINGS align (`cosine ≥ minCosine`,
    * rounded 6 — the published CLIP-score gate) AND neither side was
    * dropped by its modality's dedup (`textDropped` / `imageDropped` are
    * doc-id sets, e.g. the `doc_id =!= cluster_id` members of a
    * keep-first labeling or the `keep = 0` rows of
    * [[graft.operators.Dedup.canonicalByQuality]] — a pair whose
    * canonical was dropped on EITHER side leaves the corpus). Returns
    * the per-lang survivor funnel `(lang, n_pairs, n_aligned, n_final)`
    * — the `cur_pipeline` reporting shape.
    *
    * Scale: two equi-joins pair→embedding (shuffle on the id, no pair
    * amplification — one row per pair throughout), one codegen'd cosine
    * + filter, two anti-joins against the DROPPED sets (dup-bearing docs
    * only — usually a small fraction, broadcast-sized; this is why the
    * interface takes dropped rather than kept sets), and three
    * map-side-combined per-lang counts left-joined at stratum scale.
    * A pair citing a text/image with NO embedding row raises loudly
    * (lazy, riding the rows — the canonicalByQuality posture): silently
    * dropping it would undercount the funnel's very first stage. A
    * DUPLICATE vec_id in either embedding table raises the same way:
    * a left join against a non-unique side silently fans pairs out,
    * inflating n_aligned/n_final relative to n_pairs. */
  def pairFilter(pairs: DataFrame, textEmb: DataFrame, imageEmb: DataFrame,
      textDropped: DataFrame, imageDropped: DataFrame,
      minCosine: Double = 0.9): DataFrame = {
    require(minCosine >= -1 && minCosine <= 1,
      s"minCosine must be in [-1, 1]: $minCosine")
    // Per-side uniqueness guard, lazy and riding the rows (the
    // canonicalByQuality posture): a duplicate vec_id would silently fan
    // every pair citing it into multiple scored rows, inflating the
    // n_pairs-relative funnel counts. TABLE-level fail-fast by intent: a
    // duplicate anywhere in a declared embedding table is a malformed
    // input and raises even if no surviving pair cites it (the r15
    // ADVICE's groupBy-count form). One map-side-combined aggregate on
    // the join key — no window sort; `first` on the k==1 path is
    // deterministic because there is exactly one row.
    def side(emb: DataFrame, id: String, as: String) =
      emb.groupBy(col("vec_id").as(id))
        .agg(count(lit(1)).as("k"), first(col("embedding")).as("raw"))
        .select(col(id),
          when(col("k") > 1, raise_error(concat(
              lit(s"pairFilter: duplicate vec_id "),
              col(id).cast("string"),
              lit(s" in the $id-side embedding table — a duplicate embedding " +
                "row would fan out every pair citing it"))))
            .otherwise(col("raw")).as(as))
    val scored = pairs
      .join(side(textEmb, "text_id", "t_emb"), Seq("text_id"), "left")
      .join(side(imageEmb, "image_id", "i_emb"), Seq("image_id"), "left")
      .select(col("text_id"), col("image_id"), col("lang"),
        when(col("t_emb").isNull, raise_error(concat(
            lit("pairFilter: text_id "), col("text_id").cast("string"),
            lit(" has no embedding row — every paired caption must be embedded"))))
          .when(col("i_emb").isNull, raise_error(concat(
            lit("pairFilter: image_id "), col("image_id").cast("string"),
            lit(" has no embedding row — every paired image must be embedded"))))
          .otherwise(round(Similarity.cosine(col("t_emb"), col("i_emb")), 6))
          .as("cos"))
    val aligned = scored.where(col("cos") >= minCosine)
    val fin = aligned
      .join(textDropped.select(col("doc_id").as("text_id")),
        Seq("text_id"), "left_anti")
      .join(imageDropped.select(col("doc_id").as("image_id")),
        Seq("image_id"), "left_anti")
    def countBy(df: DataFrame, as: String): DataFrame =
      df.groupBy(col("lang")).agg(count(lit(1)).as(as))
    countBy(pairs, "n_pairs")
      .join(countBy(aligned, "n_aligned"), Seq("lang"), "left")
      .join(countBy(fin, "n_final"), Seq("lang"), "left")
      .select(col("lang"), col("n_pairs"),
        coalesce(col("n_aligned"), lit(0L)).as("n_aligned"),
        coalesce(col("n_final"), lit(0L)).as("n_final"))
  }

  /** REAL image resize: decode (ImageIO), nearest-neighbor resample to
    * `outW`×`outH` (source pixel (x·w/outW, y·h/outH), integer floor —
    * deterministic, no interpolation-kernel variance), re-encode as PNG,
    * then RE-decode the result and checksum its pixels — the full
    * decode→resample→encode→decode chain, all inside the partition-batched
    * kernel. Non-image payloads are dropped (flatMap), mirroring a real
    * media pipeline's decode-failure routing. */
  def resizeImages(media: Dataset[MediaRow], outW: Int = 4, outH: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        // tryDecode: malformed claimed-image bytes DROP (not crash) — see
        // the decode kernel's contract note.
        tryDecode(r.content).flatMap { case (img, _) =>
          val out = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < outH) {
            var x = 0
            while (x < outW) {
              out.setRGB(x, y,
                img.getRGB(x * img.getWidth / outW, y * img.getHeight / outH))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          // Guard the re-decode of our own PNG too: a null/throw here is a
          // codec fault, and a dropped row beats an executor NPE.
          tryDecode(bos.toByteArray)
            .map { case (dec, _) =>
              (r.doc_id, dec.getWidth, dec.getHeight, pixelSum(dec))
            }
        }.iterator
      }
    }.toDF("doc_id", "out_w", "out_h", "px_sum")
  }

  /** Deterministic ANIMATED fixtures through the real codec: for each doc
    * id, an animated GIF of `id % 5 + 2` full frames, 4×3, with pixels
    * derived from (id, frame, x, y, channel) alone — px(f,x,y,c) =
    * (id·31 + f·17 + x·7 + y·13 + c·5) mod 256. Each frame holds ≤ 12
    * distinct colors, comfortably inside GIF's 256-color palette, so the
    * indexed encoding round-trips pixel-exactly and a DuckDB oracle can
    * recompute every sampled frame's checksum by formula — the
    * `syntheticImages` trick extended to the multi-frame/video-like case. */
  def syntheticAnimatedGifs(ids: DataFrame): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        require(id >= 0, s"syntheticAnimatedGifs requires non-negative ids, got $id")
        val nf = (id % 5 + 2).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        // JDK QUIRK (measured, this environment): the GIF writer defaults
        // to INTERLACED output and its interlaced write path corrupts
        // images with height < 5 (rows misordered/replicated; height >= 5
        // round-trips clean). MODE_DISABLED writes sequential rows and is
        // pixel-exact at every height.
        val param = writer.getDefaultWriteParam
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            // Each frame gets its OWN IndexColorModel holding exactly its
            // colors: the JDK GIF writer derives the global color table
            // from the FIRST frame and quantizes later RGB frames against
            // it (measured: frame 2 px_sum off by ~15%), but an indexed
            // frame's palette is written as a per-frame local color table
            // and round-trips exactly.
            val rgbs = Array.tabulate(12) { p =>
              val x = p % 4; val y = p / 4
              def v(c: Int): Int =
                ((id * 31 + f * 17 + x * 7 + y * 13 + c * 5) % 256).toInt
              (v(0) << 16) | (v(1) << 8) | v(2)
            }
            val palette = rgbs.distinct
            val cm = new java.awt.image.IndexColorModel(
              8, palette.length,
              palette.map(c => ((c >> 16) & 0xff).toByte),
              palette.map(c => ((c >> 8) & 0xff).toByte),
              palette.map(c => (c & 0xff).toByte))
            val img = new java.awt.image.BufferedImage(
              4, 3, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
            var p = 0
            while (p < 12) {
              img.setRGB(p % 4, p / 4, rgbs(p))
              p += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
            f += 1
          }
          writer.endWriteSequence()
        } finally { writer.dispose(); ios.close() }
        MediaRow(id, "image/gif", bos.toByteArray)
      }
    }
  }

  /** REAL frame sampling: open ONE `ImageReader` per payload, decode every
    * `stride`-th stored frame, and emit its true dims + pixel checksum —
    * the production shape for video-style frame extraction (the codec call
    * inside the loop is where an MP4/AVI decoder would slot; GIF is the
    * multi-frame container this environment has a real codec for).
    * Non-image and malformed payloads DROP (flatMap), mirroring
    * `resizeImages`' decode-failure routing; the whole kernel is a narrow
    * partition-batched map — no shuffle, frames stream out of one reader
    * pass per payload. */
  def sampleFramesReal(media: Dataset[MediaRow], stride: Int = 2): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (sniffImageFormat(r.content).isEmpty) Iterator.empty
        else try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.content))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) Iterator.empty
            else {
              val rd = readers.next()
              try {
                rd.setInput(iis)
                val n = math.max(1, rd.getNumImages(true))
                // materialize inside the reader's lifetime: the iterator
                // must not escape rd.dispose()
                (0 until n by stride).flatMap { f =>
                  Option(rd.read(f)).map(img =>
                    (r.doc_id, f, img.getWidth, img.getHeight, pixelSum(img)))
                }.iterator
              } finally rd.dispose()
            }
          } finally iis.close()
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }.toDF("doc_id", "frame_idx", "frame_w", "frame_h", "px_sum")
  }

  /** AVI container sniff: RIFF chunk id at 0, "AVI " form type at 8. */
  private[graft] def sniffAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  private def leInt(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def putLeInt(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt)
    b.write(((v >> 16) & 0xff).toInt); b.write(((v >> 24) & 0xff).toInt)
  }

  /** Deterministic AVI fixtures — a structurally real RIFF('AVI ') file
    * built by formula: LIST(hdrl){ avih + LIST(strl){ strh('vids') +
    * strf(BITMAPINFOHEADER) } } + LIST(movi){ nf × '00db' frames }, with
    * dims/rate/frame-count/payload all derived from the id alone
    * (w = 16 + id%8, h = 8 + id%4, nf = id%6 + 2, usecPerFrame = 33333 +
    * (id%5)·1000, frame f payload byte j = (id·7 + f·11 + j·3) mod 256).
    * No codec is involved — '00db' is the uncompressed-frame chunk id —
    * so the oracle recomputes the header fields AND the full payload
    * checksum by formula while the bytes are a genuinely well-formed AVI
    * any RIFF walker parses. */
  def syntheticAvi(ids: DataFrame): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        require(id >= 0, s"syntheticAvi requires non-negative ids, got $id")
        val w = (16 + id % 8).toInt
        val h = (8 + id % 4).toInt
        val nf = (id % 6 + 2).toInt
        val usec = 33333L + (id % 5) * 1000L
        def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
          val b = new java.io.ByteArrayOutputStream()
          b.write(fourcc.getBytes("US-ASCII")); putLeInt(b, body.length.toLong)
          b.write(body)
          if (body.length % 2 == 1) b.write(0) // RIFF chunks pad to even
          b.toByteArray
        }
        def list(formType: String, content: Array[Byte]): Array[Byte] = {
          val b = new java.io.ByteArrayOutputStream()
          b.write("LIST".getBytes("US-ASCII")); putLeInt(b, content.length + 4L)
          b.write(formType.getBytes("US-ASCII")); b.write(content)
          b.toByteArray
        }
        def dwords(vs: Long*): Array[Byte] = {
          val b = new java.io.ByteArrayOutputStream()
          vs.foreach(putLeInt(b, _)); b.toByteArray
        }
        // avih: usecPerFrame, maxBytesPerSec, padding, flags, TOTALFRAMES,
        // initialFrames, streams, suggestedBufSize, WIDTH, HEIGHT, rsvd×4
        val avih = chunk("avih", dwords(usec, 0, 0, 0, nf.toLong, 0, 1,
          (w * h).toLong, w.toLong, h.toLong, 0, 0, 0, 0))
        // strh('vids'): type, handler('DIB '), 10 DWORDs incl. scale/rate,
        // length in frames; strf: BITMAPINFOHEADER(40)
        val strh = chunk("strh", "vids".getBytes("US-ASCII") ++
          "DIB ".getBytes("US-ASCII") ++
          dwords(0, 0, 0, usec, 1000000L, 0, nf.toLong, (w * h).toLong, 0, 0, 0, 0))
        val strf = chunk("strf", dwords(40L, w.toLong, h.toLong,
          (1L | (8L << 16)), 0, (w * h).toLong, 0, 0, 0, 0))
        val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
        val movi = {
          val b = new java.io.ByteArrayOutputStream()
          var f = 0
          while (f < nf) {
            val payload = Array.tabulate(w * h)(j =>
              ((id * 7 + f * 11 + j * 3) % 256).toByte)
            b.write(chunk("00db", payload))
            f += 1
          }
          list("movi", b.toByteArray)
        }
        val content = hdrl ++ movi
        val out = new java.io.ByteArrayOutputStream()
        out.write("RIFF".getBytes("US-ASCII")); putLeInt(out, content.length + 4L)
        out.write("AVI ".getBytes("US-ASCII")); out.write(content)
        MediaRow(id, "video/x-msvideo", out.toByteArray)
      }
    }
  }

  /** Video container metadata kernel — REAL RIFF/AVI chunk walking, zero
    * codecs: reads `avih` for dims / frame count / frame interval, walks
    * the `movi` list counting frame chunks (`##db`/`##dc`/`##wb` — raw,
    * compressed, audio interleave) and checksumming every payload byte.
    * Works on any well-formed AVI (the fixtures above are one instance,
    * not the contract); malformed or non-AVI payloads take the documented
    * raw branch. This is the curation pre-decode step: filter on container
    * facts before paying for a codec. Same partition-batched narrow-map
    * shape as the image/audio kernels. */
  def parseVideoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = r.content
        val len = b.length.toLong
        def raw = VideoMeta(r.doc_id, r.mime, len, "raw", 0, 0, -1L, 0L, -1L, -1L)
        if (!sniffAvi(b)) raw
        else try {
          var width = 0; var height = 0
          var usec = 0L
          // n_frames is COUNTED from movi chunks, not read from avih —
          // the header's dwTotalFrames is a claim; the chunk walk is fact.
          var nFrames = 0L; var frameBytes = 0L; var frameSum = 0L
          def isFrameChunk(id0: Byte, id1: Byte, id2: Byte, id3: Byte): Boolean = {
            val digits = (id0 >= '0' && id0 <= '9') && (id1 >= '0' && id1 <= '9')
            digits && ((id2 == 'd' && (id3 == 'b' || id3 == 'c')) ||
              (id2 == 'w' && id3 == 'b'))
          }
          // iterative chunk walk (explicit stack — arbitrary input must not
          // recurse arbitrarily deep), bounds-checked against truncation
          var stack = List((12, b.length)) // (offset, limit) inside RIFF body
          while (stack.nonEmpty) {
            var (off, limit) = stack.head
            stack = stack.tail
            while (off + 8 <= limit && off + 8 <= b.length) {
              val size = leInt(b, off + 4)
              val body = off + 8
              val end = body + size
              if (size < 0 || end > b.length || end > limit) {
                off = limit // truncated/lying chunk: stop this level
              } else {
                if (b(off) == 'L' && b(off + 1) == 'I' && b(off + 2) == 'S' &&
                  b(off + 3) == 'T' && size >= 4) {
                  stack = (body + 4, end.toInt) :: stack // skip form type
                } else if (b(off) == 'a' && b(off + 1) == 'v' &&
                  b(off + 2) == 'i' && b(off + 3) == 'h' && size >= 40) {
                  usec = leInt(b, body)
                  width = leInt(b, body + 32).toInt
                  height = leInt(b, body + 36).toInt
                } else if (isFrameChunk(b(off), b(off + 1), b(off + 2), b(off + 3))) {
                  nFrames += 1
                  frameBytes += size
                  var j = body
                  while (j < end) { frameSum += b(j) & 0xff; j += 1 }
                }
                off = (end + (size % 2)).toInt // chunks pad to even
              }
            }
          }
          if (width == 0 && nFrames == 0) raw // RIFF/AVI magic but no substance
          else VideoMeta(r.doc_id, r.mime, len, "avi", width, height,
            nFrames, usec, frameBytes, frameSum)
        } catch { case scala.util.control.NonFatal(_) => raw }
      }
    }
  }

  /** Byte-level feature extraction — REAL, not a stub: a tight primitive
    * loop over the raw payload per row (the shape a SIMD/native kernel
    * drops into), classifying every byte. The curation use: filter media
    * rows on cheap byte statistics BEFORE paying for any decode. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[ByteFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        var a = 0L; var d = 0L; var sp = 0L; var o = 0L
        var i = 0
        while (i < r.content.length) {
          val b = r.content(i)
          if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) a += 1
          else if (b >= '0' && b <= '9') d += 1
          else if (b == ' ') sp += 1
          else o += 1
          i += 1
        }
        ByteFeatures(r.doc_id, r.content.length.toLong, a, d, sp, o)
      }
    }
  }

  /** Resize stub: normalize every payload to exactly `targetBytes`
    * (truncate long, pad short with '.') — the deterministic stand-in for
    * an image resample, with the REAL plumbing: per-row binary in, fixed-
    * size binary out, fingerprint for downstream exact-dedup of the
    * resized artifacts. A real resampler replaces only the byte loop. */
  def resizeStub(media: Dataset[MediaRow], targetBytes: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = new Array[Byte](targetBytes)
        java.util.Arrays.fill(out, '.'.toByte)
        System.arraycopy(r.content, 0, out, 0, math.min(targetBytes, r.content.length))
        (r.doc_id, out.length.toLong, out)
      }
    }.toDF("doc_id", "out_len", "resized")
      .select(col("doc_id"), col("out_len"), md5(col("resized")).as("resized_md5"))
  }

  /** Frame sampling stub: split the payload into fixed-size "frames" and
    * fingerprint every `stride`-th one. Pure column ops (codegen'd) — the
    * binary slicing is exactly what a real frame sampler would do before
    * handing each slice to a decoder. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 32, stride: Int = 4): DataFrame =
    media.toDF()
      // empty payloads produce NO frames: an unguarded sequence(0, -1)
      // yields the DESCENDING [0, -1] and a spurious frame 0
      .where(length(col("content")) > 0)
      .select(col("doc_id"),
        posexplode(expr(
          s"""filter(transform(sequence(0, CAST(ceil(length(content) / $frameBytes) AS INT) - 1),
             |  i -> named_struct('fi', i, 'b', substring(content, i * $frameBytes + 1, $frameBytes))),
             |  x -> x.fi % $stride = 0)""".stripMargin)).as(Seq("pos", "f")))
      .select(col("doc_id"), col("f.fi").as("frame_idx"), md5(col("f.b")).as("frame_md5"))
}
