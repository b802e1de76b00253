package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media row: opaque bytes + typed metadata (north-star multimodal
  * column model, `BASELINE.json:6`). Image/audio decode libraries are not
  * in this environment, so the decode kernel is a clearly-marked
  * deterministic STUB — the Spark-side plumbing (binary schema, typed
  * Dataset, partition-batched kernel invocation, output shape) is real. */
final case class MediaRow(doc_id: Long, mime: String, content: Array[Byte])

/** REAL byte-level features for one media item (no stub — pure payload
  * statistics a curation pipeline filters on before any decode). */
final case class ByteFeatures(
    doc_id: Long,
    byte_len: Long,
    n_alpha: Long,
    n_digit: Long,
    n_space: Long,
    n_other: Long)

/** Stub "decoded features" for one media item. */
final case class MediaFeatures(
    doc_id: Long,
    mime: String,
    byte_len: Long,
    digest: String,       // sha256 hex of the payload
    width: Int,           // STUB: derived, a real decoder would parse the header
    height: Int,          // STUB
    n_frames: Int)        // STUB: frame count for video-ish payloads

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

  /** STUB decode kernel: one *batch* (partition iterator) in, features out.
    * A real image/audio decoder slots in here unchanged — the signature is
    * the partition-batched shape a native-library bridge needs (amortized
    * per-partition init, streaming iterator, no driver collect).
    * The fake is deterministic: sizes/digests of the payload. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init of a (stub) decoder context happens HERE once
      val digestAlg = () => java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val d = digestAlg()
        val hex = d.digest(r.content).map("%02x".format(_)).mkString
        val len = r.content.length.toLong
        // ??? real decode goes here; deterministic fake dimensions:
        MediaFeatures(r.doc_id, r.mime, len, hex,
          width = (len % 640).toInt, height = (len % 480).toInt,
          n_frames = (len % 24).toInt + 1)
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
