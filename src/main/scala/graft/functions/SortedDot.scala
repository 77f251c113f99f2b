package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Sparse integer dot product Σ w1ᵢ·w2ⱼ over matching keys of two
  * ASCENDING-sorted distinct int64 key arrays with parallel weight
  * arrays — one allocation-free two-pointer pass. This is the verify
  * primitive of the df-capped TF-IDF pair join: the row-explosion
  * alternative (candidates ⨝ per-term weights ⨝ per-term weights →
  * groupBy sum) shuffles candidates × per-doc terms ROWS, where this
  * computes each candidate's exact dot inside one projection over the
  * two docs' (terms, weights) arrays — per-pair cost O(|a|+|b|), no
  * aggregation exchange. Callers OWN the sortedness/parallelism
  * precondition (arrays built with one sort_array over (t, w)
  * structs). */
case class SortedDot(ts1: Expression, ws1: Expression,
    ts2: Expression, ws2: Expression) extends QuaternaryExpression {

  override def first: Expression = ts1
  override def second: Expression = ws1
  override def third: Expression = ts2
  override def fourth: Expression = ws2

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_dot"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    SortedDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.SortedDot.dot($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(ts1 = a, ws1 = b, ts2 = c, ws2 = d)
}

object SortedDot {
  def dot(ts1: ArrayData, ws1: ArrayData, ts2: ArrayData, ws2: ArrayData): Long = {
    val n1 = ts1.numElements()
    val n2 = ts2.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < n1 && j < n2) {
      val x = ts1.getLong(i)
      val y = ts2.getLong(j)
      if (x == y) { acc += ws1.getLong(i) * ws2.getLong(j); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    acc
  }
}
