package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Two-level IVF coarse-search index: the cure for the flat argmin's
  * n·nlist assignment term (the r8 sf10 smoke's one residual
  * superlinear cost in the auto k-NN graph — 5.4× wall at 3.33× rows
  * as nlist tracked n below the 4096 clamp). The centroid set is
  * itself an embedding corpus, so it gets its own coarse layer:
  * g = ⌈√k⌉ SUPER slots pick centroids by index stride
  * (slot i → centroid ⌊i·k/g⌋ — pure integer arithmetic any SQL
  * engine replays), every centroid joins the group of its nearest
  * super (its own slot if it IS one — no group is ever empty), and a
  * query scans the g supers plus the members of its min(4, g) nearest
  * groups: ~√k + 4·√k distance evaluations instead of k. At the 4096
  * clamp that is 64+256 vs 4096 (≈13×), and the term stays Θ(n·√nlist)
  * = Θ(n^1.5/√occ) through the growth regime instead of Θ(n²/occ).
  * All selection is by explicit (distance, index) ordering with the
  * same NaN-last fallback as [[NearestCell]], so the DuckDB oracle's
  * `row_number() OVER (ORDER BY dist, idx)` replay is value-identical.
  * When p ≥ g (small corpora) every group is probed and the search
  * degenerates to the exact flat argmin — spec-pinned. */
class TwoLevelIndex(
    val centroids: Array[Array[Double]],
    val supers: Array[Int],
    val members: Array[Array[Int]],
    val p: Int) extends Serializable

object TwoLevel {
  /** Deterministic driver-side build over the (≤4096-row) trained
    * centroid matrix — bounded work whatever the corpus size. */
  def build(cs: Array[Array[Double]], coarseProbes: Int = 4): TwoLevelIndex = {
    val k = cs.length
    if (k == 0)
      return new TwoLevelIndex(cs, Array.empty, Array.empty, 0)
    val g = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val supers = Array.tabulate(g)(i => ((i.toLong * k) / g).toInt)
    // first slot wins when duplicate vectors make two slots identical
    val slotOf = scala.collection.mutable.HashMap.empty[Int, Int]
    supers.zipWithIndex.foreach { case (c, i) =>
      if (!slotOf.contains(c)) slotOf(c) = i
    }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val members = Array.fill(g)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var c = 0
    while (c < k) {
      val grp = slotOf.getOrElse(c, {
        var best = 0; var bd = Double.MaxValue; var i = 0
        while (i < g) {
          val s = d2(cs(c), cs(supers(i)))
          if (s < bd) { bd = s; best = i }
          i += 1
        }
        best
      })
      members(grp) += c
      c += 1
    }
    new TwoLevelIndex(cs, supers, members.map(_.toArray),
      math.min(coarseProbes, g))
  }

  private def distTo(vec: ArrayData, c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) {
      val d = vec.getFloat(i) - c(i)
      s += d * d
      i += 1
    }
    s
  }

  /** The `k` nearest cells among the probed groups' members, by
    * ascending (distance, centroid index) — shared by interpreted and
    * generated code. Selection uses explicit tie-breaks (not iteration
    * order), so it matches the oracle's ORDER BY regardless of member
    * layout; all-NaN remainders fall back to the lowest untaken index,
    * [[NearestCell.nearestK]]'s contract. */
  def nearestK(vec: ArrayData, idx: TwoLevelIndex, k: Int): ArrayData = {
    val cs = idx.centroids
    if (cs.isEmpty || k <= 0) return new GenericArrayData(Array.empty[Any])
    if (vec.numElements() < cs(0).length)
      throw new IllegalArgumentException(
        s"two_level_cells: vector has ${vec.numElements()} elements, " +
          s"centroids need ${cs(0).length}")
    val g = idx.supers.length
    val cd = new Array[Double](g)
    var i = 0
    while (i < g) { cd(i) = distTo(vec, cs(idx.supers(i))); i += 1 }
    // coarse: p slots by (dist, slot) with NaN-last fallback
    val slotTaken = new Array[Boolean](g)
    val chosen = new Array[Int](idx.p)
    var r = 0
    while (r < idx.p) {
      var best = -1
      var bd = Double.MaxValue
      var m = 0
      while (m < g) {
        if (!slotTaken(m) && cd(m) < bd) { bd = cd(m); best = m }
        m += 1
      }
      if (best < 0) {
        var f = 0
        while (best < 0 && f < g) { if (!slotTaken(f)) best = f; f += 1 }
      }
      slotTaken(best) = true
      chosen(r) = best
      r += 1
    }
    // fine: gather candidates, then top-k by (dist, centroid index)
    var nCand = 0
    var ci = 0
    while (ci < idx.p) { nCand += idx.members(chosen(ci)).length; ci += 1 }
    val cand = new Array[Int](nCand)
    val dist = new Array[Double](nCand)
    var w = 0
    ci = 0
    while (ci < idx.p) {
      val ms = idx.members(chosen(ci))
      var j = 0
      while (j < ms.length) {
        cand(w) = ms(j)
        dist(w) = distTo(vec, cs(ms(j)))
        w += 1
        j += 1
      }
      ci += 1
    }
    val n = math.min(k, nCand)
    val out = new Array[Any](n)
    val taken = new Array[Boolean](nCand)
    r = 0
    while (r < n) {
      var best = -1
      var bd = Double.MaxValue
      var bc = Int.MaxValue
      var m = 0
      while (m < nCand) {
        if (!taken(m) &&
            (dist(m) < bd || (dist(m) == bd && cand(m) < bc))) {
          bd = dist(m); bc = cand(m); best = m
        }
        m += 1
      }
      if (best < 0) {
        // all remaining NaN: lowest untaken CENTROID index
        var m2 = 0
        var low = Int.MaxValue
        var li = -1
        while (m2 < nCand) {
          if (!taken(m2) && cand(m2) < low) { low = cand(m2); li = m2 }
          m2 += 1
        }
        best = li
      }
      taken(best) = true
      out(r) = cand(best)
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** The `k` nearest IVF cells via the two-level coarse search — the
  * assignment expression the auto k-NN graph ships; the flat
  * [[NearestCells]] stays on the fixed-dial twin. Index rides along as
  * a codegen reference object like the centroid matrix does. */
case class TwoLevelCells(child: Expression, index: TwoLevelIndex, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "two_level_cells"

  override protected def nullSafeEval(input: Any): Any =
    TwoLevel.nearestK(input.asInstanceOf[ArrayData], index, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tlIndex", index, "graft.functions.TwoLevelIndex")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TwoLevel.nearestK($c, $ref, $k)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
