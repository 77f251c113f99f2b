package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Morton (Z-order) interleave of two
  * 16-bit coordinates into one 32-bit curve position. Data laid out in
  * z-value order is clustered in BOTH dimensions at once, so file-level
  * min/max statistics prune scans for predicates on EITHER column — the
  * multi-dimensional clustering trick behind Delta/Iceberg OPTIMIZE
  * ZORDER, as a reusable expression. Codegen'd (bit-twiddled spread via
  * a static helper, no UDF on the layout path).
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 requires (BIGINT, BIGINT), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrder2.morton($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZOrder2 {
  /** spread the low 16 bits of x to the even bit positions */
  def part1by1(x0: Long): Long = {
    var v = x0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** static entry point shared by interpreted and generated code:
    * x bits land on even positions, y bits on odd. Coordinates must
    * already be quantized to 16 bits — a silent `& 0xFFFF` wrap would
    * scatter out-of-domain rows to unrelated curve positions and
    * quietly break min/max file pruning, so out-of-range input fails
    * loudly instead (callers clamp/quantize first, as zorderLayout
    * does). */
  def morton(x: Long, y: Long): Long = {
    if (x < 0L || x > 0xFFFFL || y < 0L || y > 0xFFFFL)
      throw new IllegalArgumentException(
        s"zorder2 coordinates must be in [0, 65535], got ($x, $y)")
    part1by1(x) | (part1by1(y) << 1)
  }
}
