package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 128-bit SimHash of a token array in ONE compiled pass, returned as
  * [word0, word1] int64s.
  *
  * This is the corpus-scale signature width (SURVEY §4): 4×32-bit
  * chunk LSH over 128 bits gives 2³² buckets per chunk position —
  * 65,536× the 64-bit scheme's bucket space — while keeping the
  * identical pigeonhole contract (hamming ≤ 3 ⇒ ≥ 1 identical chunk).
  * Word 0 is bit-identical to `simhash64` (same hash, same seed, same
  * vote rule), so the two signature widths agree where they overlap;
  * word 1 votes with an independent second seed. */
case class SimHash128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash128"

  override protected def nullSafeEval(input: Any): Any =
    SimHash128.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash128.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash128 {
  private val Seed0 = 42L   // = SimHash64's seed: word 0 matches it
  private val Seed1 = 1371L // independent second hash for bits 64..127

  /** static entry point shared by interpreted and generated code */
  def compute(tokens: ArrayData): ArrayData = {
    val votes = new Array[Int](128)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val h0 = XxHash64Function.hash(t, StringType, Seed0)
      val h1 = XxHash64Function.hash(t, StringType, Seed1)
      var b = 0
      while (b < 64) {
        if (((h0 >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        if (((h1 >>> b) & 1L) != 0L) votes(64 + b) += 1 else votes(64 + b) -= 1
        b += 1
      }
      i += 1
    }
    var w0 = 0L
    var w1 = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) w0 |= (1L << b)
      if (votes(64 + b) > 0) w1 |= (1L << b)
      b += 1
    }
    new GenericArrayData(Array(w0, w1))
  }
}
