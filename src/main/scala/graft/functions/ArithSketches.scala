package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 128-slot MinHash over PRE-HASHED shingle values with a closed-form
  * affine permutation family h_i(x) = ((2i+3)·x + i²+7) mod (2³¹−1).
  *
  * The arithmetic twin of [[MinHash128]]: where the production
  * signature derives from xxhash64 (engine-specific, so its pipeline
  * can only ever be rows-only against an external oracle), every
  * number here — the shingle hash (rolling_hash's two 31-bit
  * polynomial rolls), the permutation constants, the min-fold — is
  * plain integer arithmetic a SQL engine can replay. DuckDB therefore
  * hash-verifies the ENTIRE MinHash→LSH-banding→bucket-pair→exact-
  * Jaccard pipeline end to end (see `dedup_minhash_arith`), which the
  * xxhash-based path cannot offer at any scale factor. The affine
  * family over a Mersenne prime is the classic Broder construction;
  * small multipliers cost a little dispersion versus the LCG-drawn
  * parameters of the production path, which is why this ships as a
  * verification twin, not a replacement.
  *
  * Input values must already lie in [0, 2³¹−1); callers feed
  * `pmod(rolling_hash(s), 2147483647)`. One compiled pass per
  * document: no explode, no 128 aggregate buffers.
  */
case class MinHashAffine128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_affine128"

  override protected def nullSafeEval(input: Any): Any =
    MinHashAffine128.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashAffine128.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashAffine128 {
  val Prime = 2147483647L // 2^31 - 1, shared with MinHash128

  /** static entry point shared by interpreted and generated code */
  def compute(xs: ArrayData): ArrayData = {
    val mins = new Array[Long](128)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = xs.numElements()
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var j = 0
      while (j < 128) {
        // (2j+3)·x ≤ 257·2³¹ ≪ 2⁶³ — no overflow in long arithmetic
        val v = ((2L * j + 3L) * x + (j.toLong * j + 7L)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** 64-bit SimHash whose per-token hash is the arithmetic rolling
  * fingerprint instead of xxhash64 — the SQL-replayable twin of
  * [[SimHash64]], same ±1 vote semantics and votes>0 tie rule.
  *
  * The packed rolling hash carries 62 effective bits ((a1<<32)|a2 with
  * a1 < 2³¹−1, a2 < 2³¹−19), so bits 31 and 63 are structurally zero
  * and never vote high: the signature spends 62 of its 64 positions.
  * That costs a whisker of Hamming resolution versus the production
  * signature and buys a DuckDB oracle that re-derives every signature
  * bit and every candidate pair (see `dedup_simhash_arith`).
  */
case class SimHashRoll64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_roll64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashRoll64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashRoll64.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHashRoll64 {
  /** static entry point shared by interpreted and generated code */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = WordShingles.rollingHash(tokens.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
