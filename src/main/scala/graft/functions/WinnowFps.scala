package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fps(text[, k, w])`: all robust-winnowing fingerprints of a
  * document in ONE pass — char-`k`-gram md5 hashes (first 15 hex chars as
  * a 60-bit BIGINT, the engine's shared hash universe), window-`w` minima
  * via a monotonic deque, first-occurrence-ordered distinct — returned as
  * ARRAY<BIGINT>.
  *
  * Why a native Expression and not the SQL formulation
  * (`transform(sequence(...), i -> ...md5(substring(text, i, k))...)`):
  * `substring(text, i, k)` walks the string's BYTES from position 0 to
  * find the char offset on EVERY call — per-gram O(i), per-doc O(len²).
  * WinnowProbe measured the cliff on md5-chain corpora (500 docs,
  * local[32]): 5 KB docs 1.7 s → 25 KB 32 s → 50 KB 120 s, the same for
  * the explode+window re-formulation, because the quadratic is in the
  * substring walk, not the higher-order-function interpretation. This
  * expression walks the code-point offsets ONCE (O(len)), then hashes
  * each gram's byte slice directly — O(len·k) total, the md5 work itself.
  *
  * Exact-equivalence contract with the SQL form (spec-pinned, all edges):
  * gram count `max(1, numChars-k+1)` (short/empty docs hash one truncated
  * gram), window count `max(1, grams-w+1)` with tail windows truncated,
  * fp value = md5 digest bytes 0..7 big-endian `>>> 4` — bit-identical to
  * `cast(conv(substring(md5(...), 1, 15), 16, 10) as bigint)` — and
  * distinct in first-occurrence order like `array_distinct`. The DuckDB
  * oracles replay the same md5 universe, so oracle SQL is untouched.
  *
  * Codegen: deliberately `CodegenFallback` — the per-ROW interpreted
  * dispatch is amortized over a whole document's gram loop (the opposite
  * economics of `vec_dot`, where the work per call is tiny).
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, s"winnow_fps needs k >= 1 and w >= 1, got ($k, $w)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_fps requires STRING input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // One O(len) walk: byte offset of every code point, plus the end.
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

    val nGrams = math.max(1, n - k + 1)
    val hs = new Array[Long](nGrams)
    val md = WinnowFps.md5.get()
    var g = 0
    while (g < nGrams) {
      md.reset()
      md.update(bytes, offs(g), offs(math.min(g + k, n)) - offs(g))
      val d = md.digest()
      // digest bytes 0..7 big-endian >>> 4 == first 15 hex chars as int
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      hs(g) = v >>> 4
      g += 1
    }

    // Window minima with a monotonic deque: O(nGrams) total.
    val nWins = math.max(1, nGrams - w + 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new Array[Int](nGrams)
    var head = 0; var tail = 0 // deque of indices, values increasing
    var j = 0
    while (j < nGrams) {
      while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
      dq(tail) = j; tail += 1
      val winStart = j - w + 1
      while (dq(head) < winStart) head += 1
      // window ending at j is complete once j >= w-1; the single
      // truncated window of a short doc emits at the last gram
      if (j >= w - 1 || j == nGrams - 1) {
        if (math.max(winStart, 0) < nWins) seen.add(hs(dq(head)))
      }
      j += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
}
