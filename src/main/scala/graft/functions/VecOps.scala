package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels over array<float>/array<double> embedding
  * columns. Sums run sequentially left-to-right — the same order as a
  * fold / DuckDB's list_dot_product — so results are bit-identical to
  * the oracle, just ~100× faster per row than interpreted
  * aggregate/zip_with lambdas.
  */
private[functions] trait VecTypeCheck { self: Expression =>
  protected def vecOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
}

/** dot(a, b): Σ a_i * b_i (doubles, sequential). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with VecTypeCheck {

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(left.dataType) && vecOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires float/double arrays, got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.dot($a, ${isFloat(left)}, $b, ${isFloat(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** norm2(a): sqrt(Σ a_i²) (doubles, sequential). */
case class VecNorm(child: Expression) extends UnaryExpression with VecTypeCheck {

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_norm requires a float/double array, got ${child.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  private def isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any =
    VecKernels.norm(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.norm($a, $isFloat)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VecKernels {
  /** element i as double (float arrays upcast per element, matching
    * CAST(x AS DOUBLE) semantics) */
  @inline private def at(a: ArrayData, float: Boolean, i: Int): Double =
    if (float) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    // fail loudly on a dimension mismatch: a truncated dot product is
    // plausible-but-wrong similarity with no signal, and the DuckDB
    // parity oracle (list_dot_product) raises on mismatched lengths
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"vec_dot dimension mismatch: ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += at(a, aFloat, i) * at(b, bFloat, i); i += 1 }
    acc
  }

  def norm(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = at(a, aFloat, i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }
}
