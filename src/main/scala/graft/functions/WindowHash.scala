package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `window_hash64(text, L)`: the 64-bit rolling hash of EVERY length-`L`
  * character window of `text`, as ARRAY<BIGINT> — element `i` (0-based)
  * covers characters `[i+1, i+1+L)` in 1-based `substring` coordinates.
  * Returns an empty array when the text is shorter than `L` characters.
  *
  * Why a native Expression and not
  * `transform(sequence(1, n-L+1), p -> xxhash64(substring(text, p, L)))`:
  * the same O(len²) cliff `winnow_fps` exists for — `substring(text, p,
  * L)` re-walks the string's bytes from 0 on every call, and the probe
  * numbers in WinnowFps's scaladoc (5 KB docs 1.7 s → 50 KB 120 s) apply
  * verbatim. This expression walks the code-point offsets once, folds
  * each character's byte slice to a value, and ROLLS a degree-`L`
  * polynomial (Rabin–Karp, mod 2⁶⁴, odd multiplier) across the document:
  * O(len) total — not even the O(len·L) of per-window re-hashing.
  *
  * Hash-quality contract: callers treat repeated hashes as CANDIDATES
  * and re-verify on the exact substring ([[graft.operators.Dedup
  * .exactSubstringSpans]] step 3), so a collision costs one extra row in
  * the verify stage and can never alter a result — which is what makes a
  * cheap rolling polynomial (collision-weaker than xxhash64) the right
  * trade here. Equal windows ALWAYS hash equal (determinism of the roll),
  * so no duplicate is ever missed.
  */
case class WindowHash(child: Expression, l: Int)
    extends UnaryExpression with CodegenFallback {
  require(l >= 1, s"window_hash64 needs L >= 1, got $l")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_hash64 requires STRING input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hash64"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // one O(len) walk: per-character VALUE (byte slice folded to a long —
    // the raw byte for ASCII, a small polynomial for multibyte chars)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      i += UTF8String.numBytesForFirstByte(bytes(i)); n += 1
    }
    if (n < l) return new GenericArrayData(Array.emptyLongArray)
    val cv = new Array[Long](n)
    i = 0; var c = 0
    while (i < bytes.length) {
      val w = UTF8String.numBytesForFirstByte(bytes(i))
      var v = 0L
      var b = 0
      while (b < w) { v = v * 259L + (bytes(i + b) & 0xffL); b += 1 }
      cv(c) = v
      i += w; c += 1
    }
    // roll: h(p+1) = (h(p) - cv(p)·M^(L-1))·M + cv(p+L), mod 2^64
    val M = 0x5bd1e995L | 1L // odd multiplier
    var mTop = 1L // M^(L-1)
    var e = 0
    while (e < l - 1) { mTop *= M; e += 1 }
    val out = new Array[Long](n - l + 1)
    var h = 0L
    var j = 0
    while (j < l) { h = h * M + cv(j); j += 1 }
    out(0) = h
    var p = 0
    while (p < n - l) {
      h = (h - cv(p) * mTop) * M + cv(p + l)
      out(p + 1) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `window_md5(text, L)`: the 60-bit md5 prefix (first 15 hex chars as a
  * BIGINT — the engine's shared hash universe, bit-identical to
  * `('0x' || substr(md5(win), 1, 15))::BIGINT` and to `winnow_fps`'s
  * gram hash) of EVERY length-`L` character window, positions preserved:
  * element `i` covers chars `[i+1, i+1+L)`. Empty array when the text is
  * shorter than `L`.
  *
  * This is the CROSS-CORPUS window key: unlike [[WindowHash]]'s rolling
  * polynomial (cheap, collision-weak, safe only when an exact-text
  * verify follows), md5 equality IS the engine's text-equality standard
  * (`Dedup.exact` groups by md5(text); minhash shingles key on the same
  * 15-hex prefix), so a persisted window INDEX can store just these 8
  * bytes per distinct window and probe batches against it without
  * shipping window text. Cost: one md5 per position (O(len·L) md5 work —
  * the winnow_fps cost class), against one offset walk; same
  * CodegenFallback economics (the per-row loop amortizes dispatch). */
case class WindowMd5(child: Expression, l: Int)
    extends UnaryExpression with CodegenFallback {
  require(l >= 1, s"window_md5 needs L >= 1, got $l")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_md5 requires STRING input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_md5"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) {
      i += UTF8String.numBytesForFirstByte(bytes(i)); n += 1
    }
    if (n < l) return new GenericArrayData(Array.emptyLongArray)
    val offs = new Array[Int](n + 1)
    i = 0; var c = 0
    while (i < bytes.length) {
      offs(c) = i; i += UTF8String.numBytesForFirstByte(bytes(i)); c += 1
    }
    offs(n) = bytes.length
    val md = WindowMd5.md5.get()
    val out = new Array[Long](n - l + 1)
    var g = 0
    while (g < n - l + 1) {
      md.reset()
      md.update(bytes, offs(g), offs(g + l) - offs(g))
      val d = md.digest()
      // digest bytes 0..7 big-endian >>> 4 == first 15 hex chars as int
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(g) = v >>> 4
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowMd5 {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
}

/** `char_windows(text, positions, L)`: the length-`L` character windows
  * of `text` starting at each 1-based position in `positions`, extracted
  * with ONE O(len) code-point offset walk — the companion to
  * [[WindowHash]] for the verify stage: `transform(ps, p ->
  * substring(text, p, L))` re-walks the string per position (O(len) per
  * call → O(len²) for a fully-duplicated document, where every position
  * survives the hash pre-filter). Windows truncate at the end of the
  * text; out-of-range positions clamp to the nearest valid slice. Output
  * order matches `positions` (zip-safe). */
case class CharWindows(left: Expression, right: Expression, l: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  require(l >= 1, s"char_windows needs L >= 1, got $l")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"char_windows requires (STRING, ARRAY<BIGINT>), got ($lt, $rt)")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_windows"

  override def nullSafeEval(t: Any, ps: Any): Any = {
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val pos = ps.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var n = 0
    var i = 0
    while (i < bytes.length) {
      i += UTF8String.numBytesForFirstByte(bytes(i)); n += 1
    }
    val offs = new Array[Int](n + 1)
    i = 0; var c = 0
    while (i < bytes.length) {
      offs(c) = i; i += UTF8String.numBytesForFirstByte(bytes(i)); c += 1
    }
    offs(n) = bytes.length
    val m = pos.numElements()
    val out = new Array[AnyRef](m)
    var j = 0
    while (j < m) {
      val p = pos.getLong(j)
      val s = math.max(0, math.min(n, p - 1).toInt)
      val e = math.min(n.toLong, p - 1 + l).toInt
      out(j) = UTF8String.fromBytes(bytes, offs(s), offs(math.max(e, s)) - offs(s))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
