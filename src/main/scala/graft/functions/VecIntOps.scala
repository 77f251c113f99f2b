package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd INTEGER vector kernels over array<bigint> columns — the
  * exact-arithmetic twins of VecDot/VecNorm. The micro-int operators
  * (vec_rp_eval, vec_outliers, vec_cluster_eval, mm_retrieval) compute
  * per-pair L2²/dot with interpreted `aggregate(zip_with(...))`
  * lambdas, which dominate their wall (each element is a boxed lambda
  * invocation); these kernels run the same sequential long sum inside
  * WholeStageCodegen. Integer addition is associative and exact, so
  * results are bit-identical to the lambda form by construction — but
  * the null contract is mirrored anyway (null element ⇒ null result,
  * like a lambda fold over a null) so even degenerate inputs cannot
  * diverge. Dimension mismatch fails loudly (the VecDot discipline):
  * a silently truncated distance is plausible-but-wrong similarity.
  */
private[functions] trait LongVecTypeCheck { self: Expression =>
  protected def vecOk(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
}

/** vec_l2sq_long(a, b): Σ (a_i − b_i)² over two array<bigint>. */
case class VecL2SqLong(left: Expression, right: Expression)
    extends BinaryExpression with LongVecTypeCheck {

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(left.dataType) && vecOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_l2sq_long requires bigint arrays, got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2sq_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecIntKernels.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resTerm = ctx.freshName("l2sqRes")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |Object $resTerm = graft.functions.VecIntKernels.l2sq($a, $b);
         |if ($resTerm == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $resTerm).longValue(); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vec_dot_long(a, b): Σ a_i · b_i over two array<bigint>. */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression with LongVecTypeCheck {

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(left.dataType) && vecOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_long requires bigint arrays, got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecIntKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resTerm = ctx.freshName("dotRes")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |Object $resTerm = graft.functions.VecIntKernels.dot($a, $b);
         |if ($resTerm == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $resTerm).longValue(); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VecIntKernels {
  /** boxed Long so a null ELEMENT can yield SQL NULL exactly like the
    * interpreted lambda fold it replaces (null + x = null).
    *
    * DECLARED divergence from the lambda form (r11 ADVICE): on a
    * LENGTH MISMATCH the replaced zip_with/aggregate fold padded with
    * null and yielded a silently-NULL score; these kernels throw —
    * the repo's fail-loud contract for degenerate data (a ragged
    * embedding row is corrupt input, not a missing value). Every
    * production caller feeds fixed-dimension arrays, so the branch is
    * unreachable on well-formed corpora. */
  def l2sq(a: ArrayData, b: ArrayData): java.lang.Long = {
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"vec_l2sq_long dimension mismatch: ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"vec_dot_long dimension mismatch: ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}
