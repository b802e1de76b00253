package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `vec_dot(a, b)`: dot product of two ARRAY<DOUBLE> columns as a native
  * codegen'd Catalyst expression.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: the higher-order
  * functions interpret their lambda per element per row — profiling the
  * similarity operators showed that interpretation dominating runtime
  * (SURVEY §4.2 revisited: this is the one hot scalar kernel in the
  * engine's extension surface, the textbook case for preference order (b):
  * custom Expression with `doGenCode`).
  *
  * Numeric contract: strict left-to-right double accumulation — the same
  * IEEE operation sequence as the HOF fold it replaces and as DuckDB's
  * `list_dot_product`, so oracle hashes are unchanged.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires ARRAY<DOUBLE> inputs, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed locals: several vec_dot instances can land in
      // ONE codegen scope (e.g. the 16-centroid IVF argmax projection);
      // fixed names are a "Redefinition of local variable" CompileException
      // → silent whole-stage fallback to interpreted eval.
      val n = ctx.freshName("vdN")
      val acc = ctx.freshName("vdAcc")
      val i = ctx.freshName("vdI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Engine function registry. Wire-up paths:
  *   - `spark.sql.extensions=graft.GraftExtensions` (the public
  *     `SparkSessionExtensions` route, used by all engine entry points);
  *   - `GraftFunctions.ensure(spark)` for sessions built elsewhere.
  */
object GraftFunctions {
  val dotInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  val winnowInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_fps"),
    new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
    (children: Seq[Expression]) => children match {
      case Seq(t) => WinnowFps(t, 32, 16)
      case Seq(t, kE, wE) =>
        // k and w shape the per-row algorithm, not per-row data — they
        // must be foldable literals.
        require(kE.foldable && wE.foldable, "winnow_fps k and w must be literals")
        WinnowFps(t,
          kE.eval().asInstanceOf[Number].intValue(),
          wE.eval().asInstanceOf[Number].intValue())
      case c => throw new IllegalArgumentException(
        s"winnow_fps takes (text) or (text, k, w), got ${c.length} args")
    })

  val hilbertInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hilbert_d"),
    new ExpressionInfo(classOf[HilbertValue].getName, "hilbert_d"),
    (children: Seq[Expression]) => children match {
      case Seq(x, y) => HilbertValue(x, y, 16)
      case Seq(x, y, bE) =>
        // bits shapes the per-row loop, not per-row data — a literal.
        require(bE.foldable, "hilbert_d bits must be a literal")
        HilbertValue(x, y, bE.eval().asInstanceOf[Number].intValue())
      case c => throw new IllegalArgumentException(
        s"hilbert_d takes (x, y) or (x, y, bits), got ${c.length} args")
    })

  val windowHashInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("window_hash64"),
    new ExpressionInfo(classOf[WindowHash].getName, "window_hash64"),
    (children: Seq[Expression]) => children match {
      case Seq(t, lE) =>
        // L shapes the per-row roll, not per-row data — a literal.
        require(lE.foldable, "window_hash64 L must be a literal")
        WindowHash(t, lE.eval().asInstanceOf[Number].intValue())
      case c => throw new IllegalArgumentException(
        s"window_hash64 takes (text, L), got ${c.length} args")
    })

  val windowMd5Info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("window_md5"),
    new ExpressionInfo(classOf[WindowMd5].getName, "window_md5"),
    (children: Seq[Expression]) => children match {
      case Seq(t, lE) =>
        require(lE.foldable, "window_md5 L must be a literal")
        WindowMd5(t, lE.eval().asInstanceOf[Number].intValue())
      case c => throw new IllegalArgumentException(
        s"window_md5 takes (text, L), got ${c.length} args")
    })

  val charWindowsInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_windows"),
    new ExpressionInfo(classOf[CharWindows].getName, "char_windows"),
    (children: Seq[Expression]) => children match {
      case Seq(t, ps, lE) =>
        require(lE.foldable, "char_windows L must be a literal")
        CharWindows(t, ps, lE.eval().asInstanceOf[Number].intValue())
      case c => throw new IllegalArgumentException(
        s"char_windows takes (text, positions, L), got ${c.length} args")
    })

  val mortonInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("morton_d"),
    new ExpressionInfo(classOf[MortonValue].getName, "morton_d"),
    (children: Seq[Expression]) => {
      // last arg is the bits literal; the rest are the rank columns
      require(children.size >= 2, "morton_d takes (x1[, x2, ...], bits)")
      val bE = children.last
      require(bE.foldable, "morton_d bits must be a literal")
      MortonValue(children.init, bE.eval().asInstanceOf[Number].intValue())
    })

  /** Idempotent imperative registration for pre-built sessions. */
  def ensure(spark: SparkSession): Unit =
    Seq(dotInfo, winnowInfo, windowHashInfo, windowMd5Info, charWindowsInfo,
      hilbertInfo, mortonInfo).foreach { info =>
      if (!spark.sessionState.functionRegistry.functionExists(info._1))
        spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    Seq(GraftFunctions.dotInfo, GraftFunctions.winnowInfo,
      GraftFunctions.windowHashInfo, GraftFunctions.windowMd5Info,
      GraftFunctions.charWindowsInfo, GraftFunctions.hilbertInfo,
      GraftFunctions.mortonInfo)
      .foreach(ext.injectFunction)
}
