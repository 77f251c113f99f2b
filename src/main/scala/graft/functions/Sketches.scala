package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable-sketch aggregates past what Spark ships natively (it has
  * DataSketches HLL only): KLL quantile sketches and theta sketches,
  * as Catalyst TypedImperativeAggregates — the buffer is the live
  * sketch object inside a partition (no per-row serialization) and the
  * compact byte image only crosses the shuffle, which is exactly the
  * 100 TB rollup contract: a partial is O(k) bytes regardless of data
  * size, merge is associative/commutative, and coarser granularities
  * union finer sketches instead of rescanning the facts.
  *
  * Exactness regimes, which the oracle strategy leans on: a KLL
  * sketch is EXACT (holds every value, quantiles are true order
  * statistics) while n ≤ k, and a theta sketch is EXACT while the
  * distinct count stays under its nominal entry budget 2^lgK. Below
  * those thresholds both engines can agree bit-for-bit with a plain
  * SQL oracle; above them KLL compaction is randomized (inherent to
  * the algorithm) and theta degrades to a ±1/√k relative-error
  * estimate — the specs exercise that regime with constructed data
  * and pin error envelopes instead.
  *
  * The scalar readers (kll_quantile / theta_*) are CodegenFallback by
  * design: they run on the post-rollup rows — one per group, bounded
  * by the grouping cardinality — never on the per-row hot path.
  */
object SketchDefaults {
  /** exact through the sf0.1 per-type row count; ~256 KiB worst case */
  val kllK: Int = 32768
  /** nominal 4096 entries — exact through every test-SF user count */
  val thetaLgK: Int = 12
}

/** kll_agg(value): build a KLL doubles sketch per group. */
case class KllAgg(child: Expression, k: Int = SketchDefaults.kllK,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllAgg = copy(child = c)
}

/** kll_merge_agg(sketch_bytes): union previously-built KLL sketches —
  * the rollup side of the two-level aggregate. */
case class KllMergeAgg(child: Expression, k: Int = SketchDefaults.kllK,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }
  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg = copy(child = c)
}

/** kll_quantile(sketch_bytes, rank): INCLUSIVE-rank quantile — the
  * smallest retained value whose cumulative weight ≥ ceil(rank·n).
  * NULL on an empty sketch. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  override protected def nullSafeEval(bytes: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(rank.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** kll_n(sketch_bytes): total update count the sketch has absorbed. */
case class KllN(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "kll_n"
  override protected def nullSafeEval(bytes: Any): Any =
    KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]])).getN
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** theta_agg(key): build a theta sketch of distinct int64 keys. */
case class ThetaAgg(child: Expression, lgK: Int = SketchDefaults.thetaLgK,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }
  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaAgg = copy(child = c)
}

/** theta_union_agg(sketch_bytes): union previously-built theta
  * sketches — register-level max-merge twin of hll_union_agg. */
case class ThetaUnionAgg(child: Expression, lgK: Int = SketchDefaults.thetaLgK,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }
  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg = copy(child = c)
}

private object ThetaOps {
  def wrap(bytes: Any): Sketch = Sketches.wrapSketch(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
  def intersect(a: Sketch, b: Sketch): CompactSketch = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(a); i.intersect(b); i.getResult
  }
}

/** theta_estimate(sk): distinct estimate (exact while under budget). */
case class ThetaEstimate(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(bytes: Any): Any = ThetaOps.wrap(bytes).getEstimate
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** theta_intersect(a, b): |A ∩ B| estimate — the set operation HLL
  * fundamentally cannot do (HLL registers only union). */
case class ThetaIntersect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.intersect(ThetaOps.wrap(a), ThetaOps.wrap(b)).getEstimate
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** theta_diff(a, b): |A \ B| estimate. */
case class ThetaDiff(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_diff"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaOps.wrap(a), ThetaOps.wrap(b)).getEstimate
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** theta_union2(a, b): |A ∪ B| estimate of two compact sketches. */
case class ThetaUnion2(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_union2"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val u = SetOperation.builder().buildUnion()
    u.union(ThetaOps.wrap(a)); u.union(ThetaOps.wrap(b))
    u.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
