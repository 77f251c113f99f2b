package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** argmin-distance cell assignment for an IVF coarse quantizer: given
  * a float vector and the (driver-trained, broadcast-by-reference)
  * centroid matrix, returns the index of the nearest centroid by
  * squared L2 distance. Ties break to the lowest index —
  * deterministic. The centroid matrix rides along as a codegen
  * reference object, so the per-row work is one tight k×dim loop
  * inside WholeStageCodegen. */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  override protected def nullSafeEval(input: Any): Any =
    NearestCell.nearest(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.NearestCell.nearest($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Multi-probe variant: the `p` nearest centroid indices in ascending
  * distance order (ties to the lower index) — the IVF nprobe > 1
  * search path, where a query inspects several adjacent cells to
  * recover neighbors that straddle a cell boundary. Same
  * broadcast-by-reference centroid matrix, same tight loop. */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], p: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(input: Any): Any =
    NearestCell.nearestK(input.asInstanceOf[ArrayData], centroids, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NearestCell.nearestK($c, $ref, $p)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NearestCell {
  /** A vector shorter than the trained dimensionality would send
    * UnsafeArrayData.getFloat past the row's bounds — a raw memory
    * read returning garbage distances and a silently wrong cell. Fail
    * loudly instead (same contract as VecKernels.dot). A LONGER vector
    * is allowed: subspace quantizers legitimately score a prefix. */
  private def checkDim(vec: ArrayData, cs: Array[Array[Double]]): Unit =
    if (cs.length > 0 && vec.numElements() < cs(0).length)
      throw new IllegalArgumentException(
        s"nearest_cell: vector has ${vec.numElements()} elements, " +
          s"centroids need ${cs(0).length}")

  /** static entry point shared by interpreted and generated code: the
    * k nearest centroid indices by ascending (dist, index) — a simple
    * selection pass; centroid counts are small by construction. */
  def nearestK(vec: ArrayData, cs: Array[Array[Double]], k: Int): ArrayData = {
    checkDim(vec, cs)
    val dists = new Array[Double](cs.length)
    var j = 0
    while (j < cs.length) {
      val c = cs(j)
      var s = 0.0
      var i = 0
      while (i < c.length) {
        val d = vec.getFloat(i) - c(i)
        s += d * d
        i += 1
      }
      dists(j) = s
      j += 1
    }
    val n = math.min(k, cs.length)
    val out = new Array[Any](n)
    val taken = new Array[Boolean](cs.length)
    var r = 0
    while (r < n) {
      var best = -1
      var bestDist = Double.MaxValue
      var m = 0
      while (m < cs.length) {
        if (!taken(m) && dists(m) < bestDist) { bestDist = dists(m); best = m }
        m += 1
      }
      if (best < 0) {
        // all remaining distances NaN (a NaN component poisons every
        // comparison): fall back to the lowest untaken index so the
        // multi-probe variant degrades exactly like single-probe
        // `nearest` (which returns its initial index) instead of
        // indexing taken(-1)
        var f = 0
        while (best < 0 && f < cs.length) { if (!taken(f)) best = f; f += 1 }
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /** static entry point shared by interpreted and generated code */
  def nearest(vec: ArrayData, cs: Array[Array[Double]]): Int = {
    checkDim(vec, cs)
    var best = 0
    var bestDist = Double.MaxValue
    var j = 0
    while (j < cs.length) {
      val c = cs(j)
      var s = 0.0
      var i = 0
      while (i < c.length) {
        val d = vec.getFloat(i) - c(i)
        s += d * d
        i += 1
      }
      if (s < bestDist) { bestDist = s; best = j }
      j += 1
    }
    best
  }
}
