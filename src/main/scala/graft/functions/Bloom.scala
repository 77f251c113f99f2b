package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** Distributed Bloom-filter build + codegen'd probe, for semi-join
  * pruning: build a FIXED-SIZE bit array over the join keys of the
  * selective side (a distributive OR-merge aggregate — map-side
  * combine applies, each partial is `words`×8 bytes regardless of data
  * size), ship the bits to the probe side as a plan literal, and drop
  * fact rows that cannot match BEFORE they reach the shuffle. False
  * positives survive the probe and are eliminated by the real join, so
  * the composed operator is EXACTLY the plain join — only cheaper by
  * (1 - selectivity - fpp) of the fact-side shuffle volume.
  *
  * Build and probe share one hash family ([[BloomKernel.fmix64]]
  * double hashing), so false negatives are impossible by construction
  * (property-fuzzed in BloomSpec).
  */
object BloomKernel {
  /** murmur3 fmix64 finalizer — full 64-bit avalanche. */
  @inline def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  @inline private def h2(key: Long): Long =
    fmix64(key ^ 0x9e3779b97f4a7c15L) | 1L // odd => full-period stride

  /** set numHashes bits of `key` in `bits` (length must be a power of
    * two so the modulo is a mask). */
  def set(bits: Array[Long], key: Long, numHashes: Int): Unit = {
    val mask = bits.length.toLong * 64L - 1L
    val a = fmix64(key); val b = h2(key)
    var i = 0
    while (i < numHashes) {
      val idx = (a + i.toLong * b) & mask
      bits((idx >>> 6).toInt) |= 1L << (idx & 63L)
      i += 1
    }
  }

  /** probe — called from generated code (static forwarder). */
  def mightContain(bits: ArrayData, key: Long, numHashes: Int): Boolean = {
    val mask = bits.numElements().toLong * 64L - 1L
    val a = fmix64(key); val b = h2(key)
    var i = 0
    while (i < numHashes) {
      val idx = (a + i.toLong * b) & mask
      if ((bits.getLong((idx >>> 6).toInt) & (1L << (idx & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}

/** One-pass distributed Bloom build: reduce sets bits, merge ORs two
  * bit arrays — associative + commutative, so partial aggregation is
  * exact and the shuffled state is the fixed `words`×8-byte array.
  */
case class BloomAgg(words: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(words > 0 && (words & (words - 1)) == 0, "words must be a power of two")

  override def zero: Array[Long] = new Array[Long](words)
  override def reduce(b: Array[Long], key: Long): Array[Long] = {
    BloomKernel.set(b, key, numHashes); b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** bloom_might_contain(bits, key): codegen'd probe that stays inside
  * WholeStageCodegen, so the pre-shuffle prune costs `numHashes` cache
  * probes per fact row — no UDF, no boxing on the hot path.
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires (ARRAY<BIGINT>, BIGINT), got ($l, $r)")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(bits: Any, key: Any): Any =
    BloomKernel.mightContain(bits.asInstanceOf[ArrayData], key.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.BloomKernel.mightContain($b, $k, $numHashes)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
