package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** `hilbert_d(x, y[, bits])`: the Hilbert-curve index of a 2-D cell —
  * the locality-preserving alternative to the Morton interleave for file
  * clustering (`operators/Layout`). Unlike the Z-curve, whose diagonal
  * jumps periodically place curve-adjacent cells far apart in space,
  * consecutive Hilbert indices are ALWAYS grid neighbors (spec-asserted
  * by full-grid enumeration), so a curve segment = one file covers a
  * tighter box and min/max pruning survives with less slack — the
  * reason modern clustered table layouts default to Hilbert.
  *
  * Algorithm: the standard bit-level xy→d transform (Hilbert 1891; the
  * iterative quadrant rotate/flip formulation) — `bits` iterations of a
  * few integer ops per row. A native Expression rather than a Column
  * tree because each level's (x, y) feed the next level's through the
  * rotation: as nested when() columns the expression tree doubles per
  * level (2^bits nodes); as a loop it is O(bits). Codegen'd — the work
  * per call is tiny, so interpreted dispatch would dominate (the
  * `vec_dot` economics, opposite of `winnow_fps`).
  *
  * Inputs are non-negative `bits`-bit ranks (LongType); out-of-range
  * bits above `bits` are ignored by construction (each level masks one
  * bit). Null propagates like any binary arithmetic — callers that want
  * null→origin wrap in coalesce (Layout does). */
case class HilbertValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && 2 * bits <= 62,
    s"hilbert_d needs 1 <= bits and 2*bits <= 62, got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_d requires (BIGINT, BIGINT), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_d"

  override def nullSafeEval(xa: Any, ya: Any): Any =
    HilbertValue.xy2d(xa.asInstanceOf[Long], ya.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val cls = classOf[HilbertValue].getName
      s"${ev.value} = $cls.xy2d($xv, $yv, $bits);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertValue {
  /** The shared interpreted/codegen kernel (called from generated Java). */
  def xy2d(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate/flip the quadrant so the sub-curve orients correctly
      if (ry == 0L) {
        if (rx == 1L) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
